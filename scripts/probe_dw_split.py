"""Probe: does splitting wide depthwise convs into <=64-channel slices
beat XLA's one-shot dw lowering?

Motivation: docs/roofline.md attributes dec4's 2.6x-over-bound gap to
XLA's depthwise lowering whose time scales with C beyond 64 lanes.
Depthwise is channel-independent, so slicing channels is mathematically
exact.  Measured IN CONTEXT (whole-forward A/B at production shape,
bf16 b128) because isolated op calls carry a ~1.4 ms fixed cost on this
platform (CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 550 \
  python -u scripts/probe_dw_split.py > /tmp/probe_dw_split.log 2>&1
"""
import json
import os

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.models import mobilenet as MN
from fastdepth_tpu.models.fused import _SKIP_TAPS
from fastdepth_tpu.ops import blocks as B

BATCH = 128
model = fastdepth_pruned()
cfg = model.config
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      model.fold(model.init(jax.random.PRNGKey(0))))
x = jnp.asarray(np.random.RandomState(0).rand(BATCH, 224, 224, 3), jnp.bfloat16)


def dw_maybe_split(y, w, b, chunk):
    """Exact: depthwise conv is channel-independent."""
    c = y.shape[-1]
    if chunk is None or c <= chunk:
        return B.relu(B.depthwise_conv2d(y, w, bias=b))
    parts = []
    for s in range(0, c, chunk):
        e = min(s + chunk, c)
        parts.append(B.relu(B.depthwise_conv2d(
            y[..., s:e], w[..., s:e], bias=b[s:e])))
    return jnp.concatenate(parts, axis=-1)


def forward(params, x, split_stages):
    """apply_fastdepth_opt with per-stage dw channel splitting."""
    feats, tapped = MN.apply_encoder(params["encoder"], x,
                                     relu6=cfg.encoder_relu6, taps=_SKIP_TAPS)
    dec = params["decoder"]
    y = feats
    skips = {2: 5, 3: 3, 4: 1}
    for i in range(1, 6):
        p = dec[f"decode_conv{i}"]
        y = dw_maybe_split(y, p["dw"]["w"], p["dw"]["b"], split_stages.get(i))
        y = B.relu(B.conv2d(y, p["pw"]["w"], bias=p["pw"]["b"]))
        if i == 5:
            break
        y = B.upsample_nearest2x(y)
        if i in skips:
            y = y + tapped[skips[i]]
    head = dec["decode_conv6"]["pw"]
    y = B.relu(B.conv2d(y, head["w"], bias=head["b"]))
    return B.upsample_nearest2x(y)


VARIANTS = {
    "baseline": {},
    "dec4@64": {4: 64},
    "dec3+4@64": {3: 64, 4: 64},
    "dec1-4@64": {1: 64, 2: 64, 3: 64, 4: 64},
}

results = {}
ref_out = None
for name, splits in VARIANTS.items():
    fn = jax.jit(lambda p, a, s=splits: forward(p, a, s))
    out = fn(params, x)
    if ref_out is None:
        ref_out = np.asarray(out, np.float32)
    else:
        d = float(np.max(np.abs(np.asarray(out, np.float32) - ref_out)))
        assert d == 0.0 or d < 1e-2, (name, d)  # exactness check (bf16)
        results[f"{name}_maxdiff"] = d
    stats = time_pipelined(fn, (params, x), warmup=3, calls=60)
    fps = BATCH / stats["mean_s"]
    results[f"{name}_fps"] = round(fps, 1)
    results[f"{name}_us_per_frame"] = round(1e6 / fps, 2)
    print(f"{name:12s}: {fps:,.0f} fps  {1e6 / fps:.2f} us/frame", flush=True)

with open("/tmp/probe_dw_split.json", "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results, indent=1))
