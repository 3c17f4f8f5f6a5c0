"""Composite layer helpers shared by all model families.

Each composite is a pure function over a param dict.  Two param shapes are
accepted everywhere:

* unfolded:  {'w': conv_weight, 'bn': {scale, bias, mean, var}}
* folded:    {'w': folded_weight, 'b': folded_bias}      (inference fast path)

In training mode, freshly-computed BatchNorm running stats are recorded
into the ``stats`` dict keyed by ``path`` (a tuple of names); the trainer
merges them back into the param tree after the step.
"""

from __future__ import annotations

from typing import Callable, Dict, MutableMapping, Optional, Tuple

import jax

from fastdepth_tpu.ops import blocks as B
from fastdepth_tpu.ops import init as I

Array = jax.Array
StatsDict = MutableMapping[Tuple[str, ...], Dict[str, Array]]


def sub_stats(stats: Optional[StatsDict], prefix: str):
    """Adapter that prefixes stat paths written by sub-modules — shared
    stats plumbing for every model family."""
    if stats is None:
        return None

    class _Prefixed(dict):
        def __setitem__(self, key, value):
            stats[(prefix,) + key] = value

    return _Prefixed()


def apply_conv_bn(
    x: Array,
    p: Dict,
    *,
    stride: int = 1,
    act: Optional[Callable[[Array], Array]] = B.relu,
    depthwise: bool = False,
    transpose: bool = False,
    padding: Optional[int] = None,
    output_padding: int = 0,
    groups: int = 1,
    train: bool = False,
    stats: Optional[StatsDict] = None,
    path: Tuple[str, ...] = (),
) -> Array:
    if transpose:
        y = B.conv2d_transpose(
            x, p["w"], stride=stride, padding=padding or 0,
            output_padding=output_padding, groups=groups, bias=p.get("b"),
        )
    elif depthwise:
        if groups != 1:
            raise ValueError(
                "groups is only plumbed through the transpose path; "
                "depthwise convs group implicitly (one group per channel)")
        y = B.depthwise_conv2d(x, p["w"], stride=stride, padding=padding, bias=p.get("b"))
    else:
        if groups != 1:
            raise ValueError(
                "groups is only plumbed through the transpose path; "
                "grouped forward convs are not implemented")
        y = B.conv2d(x, p["w"], stride=stride, padding=padding, bias=p.get("b"))
    if "bn" in p:
        if train:
            y, new_bn = B.batch_norm_train(y, p["bn"])
            if stats is not None:
                stats[path + ("bn",)] = new_bn
        else:
            y = B.batch_norm(y, p["bn"])
    if act is not None:
        y = act(y)
    return y


def init_conv_bn(key: jax.Array, k: int, cin: int, cout: int) -> Dict:
    """conv kxk (no bias) + BN, init per reference weights_init
    (models.py:36-50)."""
    return {"w": I.he_normal_conv(key, k, k, cin, cout), "bn": I.bn_init(cout)}


def init_depthwise_bn(key: jax.Array, k: int, c: int) -> Dict:
    return {"w": I.he_normal_depthwise(key, k, k, c), "bn": I.bn_init(c)}


def init_pointwise_bn(key: jax.Array, cin: int, cout: int) -> Dict:
    return {"w": I.he_normal_conv(key, 1, 1, cin, cout), "bn": I.bn_init(cout)}


def init_convt_bn(key: jax.Array, k: int, cin: int, cout: int, *, groups: int = 1) -> Dict:
    """transpose conv + BN; HWOI weight (kh, kw, cout/groups, cin)."""
    return {
        "w": I.he_normal_convt(key, k, k, cout // groups, cin),
        "bn": I.bn_init(cout),
    }


def fold_params(p: Dict, *, transpose: bool = False) -> Dict:
    """Fold {'w','bn'} -> {'w','b'}; pass through already-folded dicts."""
    if "bn" not in p:
        return p
    w_f, b_f = B.fold_bn(p["w"], p["bn"], transpose=transpose)
    return {"w": w_f, "b": b_f}


def tree_fold(params, *, transpose_keys: Tuple[str, ...] = ()) -> Dict:
    """Recursively fold every {'w','bn'} leaf-pair in a nested param dict.

    ``transpose_keys``: names of subtrees holding HWOI transpose weights.
    """

    def rec(node, under_transpose):
        if isinstance(node, dict):
            if "w" in node and "bn" in node:
                return fold_params(node, transpose=under_transpose)
            return {
                k: rec(v, under_transpose or k in transpose_keys)
                for k, v in node.items()
            }
        return node

    return rec(params, False)


def merge_stats(params: Dict, stats: StatsDict) -> Dict:
    """Return params with updated BN running mean/var merged in (pure;
    safe under jit tracing).  Only the keys present in each stats entry
    are replaced — scale/bias keep their (optimizer-updated) values."""
    if not stats:
        return params

    def rec(node, prefix):
        if isinstance(node, dict):
            return {
                k: (dict(v, **stats[prefix + (k,)]) if prefix + (k,) in stats else rec(v, prefix + (k,)))
                for k, v in node.items()
            }
        return node

    return rec(params, ())
