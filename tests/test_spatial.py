"""Spatial partitioning (the 'space' mesh axis): image-height sharding
with XLA-SPMD halo exchange.

The reference has no distributed machinery (SURVEY.md §2 'Parallelism');
DP covers throughput, and this axis is the TPU-native answer for
*latency*: a CNN has no sequence dimension to tensor-shard, but H
divides cleanly and convs only need (k-1)/2 halo rows, which the SPMD
partitioner exchanges via collective-permute over ICI neighbours.

Contracts verified here:
* pure-'space' forward is BIT-exact vs single device (no reduction
  crosses the shard boundary — convs reduce over unsharded C/k axes),
* the compiled module really uses collective-permute halo exchange
  (mechanism, not just outcome),
* Evaluator / Trainer on a 2-D (data, space) mesh match single-device
  results (metric sums / loss+grads close over both axes via SPMD).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import FASTDEPTH_PRUNED, ModelConfig, TrainConfig
from fastdepth_tpu.engine import Evaluator
from fastdepth_tpu.models import build
from fastdepth_tpu.parallel import make_mesh, make_mesh_2d, replicate, shard_activations
from fastdepth_tpu.parallel.mesh import put_replicated, put_sharded

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC = (18, 14, 10, 6, 4)
CFG = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC)


@pytest.fixture(scope="module")
def tiny_model():
    model = build(CFG)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    return model, params


def _rand_batch(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    rgb = np.asarray(rng.rand(n, h, w, 3), np.float32)
    depth = np.asarray(rng.rand(n, h, w, 1) * 9 + 0.5, np.float32)
    return rgb, depth


def test_spatial_forward_pure_sp_matches_single(tiny_model):
    """b1 forward H-sharded 8-way == single device to reassociation
    noise.  Spatial partitioning never crosses a reduction boundary
    (convs reduce over the unsharded kernel/channel axes); the only
    drift is XLA picking different conv tilings per shard extent
    (measured: max abs 1.3e-12 here; the full-width net at 224 is
    bitwise identical on the same 8-way mesh)."""
    model, params = tiny_model
    rgb, _ = _rand_batch(1, 64, 64)

    ref = np.asarray(jax.jit(model.apply)(params, jnp.asarray(rgb)))

    mesh = make_mesh(8, "space")
    f = jax.jit(
        model.apply,
        in_shardings=(
            jax.tree.map(lambda _: replicate(mesh), params),
            shard_activations(mesh),
        ),
        out_shardings=shard_activations(mesh),
    )
    out = f(put_replicated(params, mesh), put_sharded(jnp.asarray(rgb), mesh))
    shard_h = {s.data.shape[1] for s in out.addressable_shards}
    assert shard_h == {64 // 8}, "output must stay H-sharded 8-way"
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-9)


def test_spatial_halo_exchange_in_compiled_module(tiny_model):
    """Mechanism check: the SPMD partitioner exchanges conv halos via
    collective-permute; a forward pass has no cross-shard reductions, so
    no all-reduce may appear."""
    model, params = tiny_model
    mesh = make_mesh(8, "space")
    act = shard_activations(mesh)
    params_r = put_replicated(params, mesh)
    x = put_sharded(jnp.zeros((1, 64, 64, 3), jnp.float32), mesh)
    f = jax.jit(
        model.apply,
        in_shardings=(jax.tree.map(lambda a: a.sharding, params_r), act),
        out_shardings=act,
    )
    txt = f.lower(params_r, x).compile().as_text()
    assert txt.count("collective-permute") > 0
    assert txt.count("all-reduce") == 0


def test_put_sharded_policy_2d_mesh():
    """put_sharded on a (data, space) mesh splits batch AND height; the
    1-D call sites keep their batch-only behavior."""
    mesh2 = make_mesh_2d(2, 4)
    arr = put_sharded(jnp.zeros((8, 32, 16, 3)), mesh2)
    assert {s.data.shape for s in arr.addressable_shards} == {(4, 8, 16, 3)}

    mesh1 = make_mesh(8)
    arr1 = put_sharded(jnp.zeros((8, 32, 16, 3)), mesh1)
    assert {s.data.shape for s in arr1.addressable_shards} == {(1, 32, 16, 3)}


def test_mesh_policy_rejects_unknown_axes():
    """A mesh whose axes match neither 'data' nor 'space' must raise,
    not silently replicate all work to every device (regression: the
    policy helpers once fell back to P(None, None))."""
    from fastdepth_tpu.parallel.mesh import shard_batch

    bad = make_mesh(8, "batch")
    with pytest.raises(ValueError, match="neither"):
        shard_activations(bad)
    with pytest.raises(ValueError, match="data"):
        shard_batch(bad)  # strict: missing axis is a misconfigured mesh
    with pytest.raises(ValueError, match="devices"):
        make_mesh(1024)  # more than available: raise, don't truncate


def test_spatial_eval_2d_mesh_matches_single(tiny_model):
    """Evaluator over a 2-D (data=2, space=4) mesh reproduces the
    single-device metric stack (cross-chip AverageMeter semantics,
    reference metrics.py:58-95, now closed over TWO mesh axes)."""
    model, params = tiny_model
    rgb, depth = _rand_batch(8, 64, 64, seed=1)

    ev1 = Evaluator(model, params, batch_size=8, fold_bn=False)
    _, m1 = ev1(ev1.put(rgb), ev1.put(depth))

    mesh = make_mesh_2d(2, 4)
    evN = Evaluator(model, params, batch_size=8, fold_bn=False, mesh=mesh)
    _, mN = evN(evN.put(rgb), evN.put(depth))

    m1, mN = np.asarray(m1), np.asarray(mN)
    fin = np.isfinite(m1)
    assert fin.any()
    np.testing.assert_allclose(mN[fin], m1[fin], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_spatial_forward_fullwidth_bitexact():
    """docs/architecture.md's claim, committed as evidence: the REAL
    pruned flagship at 224x224 is BITWISE identical H-sharded 8-way vs
    single device.  At full width every conv tiling is lane-aligned and
    XLA picks the same reduction order per shard, so — unlike the tiny
    64x64 case above, which drifts at the 1e-12 level — equality here is
    exact."""
    model = build(FASTDEPTH_PRUNED)
    params = model.fold(model.init(jax.random.PRNGKey(2)))
    rgb = np.asarray(np.random.RandomState(3).rand(1, 224, 224, 3), np.float32)

    ref = np.asarray(jax.jit(model.apply)(params, jnp.asarray(rgb)))

    mesh = make_mesh(8, "space")
    act = shard_activations(mesh)
    params_r = put_replicated(params, mesh)
    f = jax.jit(
        model.apply,
        in_shardings=(jax.tree.map(lambda a: a.sharding, params_r), act),
        out_shardings=act,
    )
    out = np.asarray(f(params_r, put_sharded(jnp.asarray(rgb), mesh)))
    assert np.array_equal(out, ref)


def test_spatial_halo_artifact_consistent():
    """docs/spatial_halo_r3.json (the traffic accounting behind
    docs/spatial.md's break-even table) must be self-consistent: the
    per-shape sums equal the stored totals and the break-even formula
    reproduces the stored values."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "docs", "spatial_halo_r3.json")
    with open(path) as f:
        d = json.load(f)
    t1 = d["t1_b1_us"]
    assert len(d["rows"]) >= 3
    for r in d["rows"]:
        s_shards = r["space_shards"]
        total = sum(s["wire_bytes_each"] * s["count"] for s in r["by_shape"])
        assert total == r["halo_bytes_per_device"] > 0
        for s in r["by_shape"]:
            # permute results travel in full; an all-gather result
            # includes the device's own shard -> (S-1)/S on the wire
            if s["kind"] == "collective-permute":
                assert s["wire_bytes_each"] == s["result_bytes_each"]
            else:
                assert s["wire_bytes_each"] == (
                    s["result_bytes_each"] * (s_shards - 1) // s_shards)
        n_cp = sum(s["count"] for s in r["by_shape"]
                   if s["kind"] == "collective-permute")
        assert n_cp == r["collective_permutes"] > 0
        saved = t1 * (1 - 1 / s_shards)
        assert abs(saved - r["compute_saved_us_vs_single"]) < 0.06
        be = total / (saved * 1e-6) / 1e9
        assert abs(be - r["breakeven_ici_GBs"]) < 0.01


def test_sp_grad_probe_artifact_shape():
    """docs/probe_r3_sp_grad.json — the committed evidence behind the
    Trainer's 'space' rejection — must carry the localization facts the
    docs cite: primal + eval-mode-grad exactness, dw-only divergence,
    and at least one row with a macroscopic diff."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "docs", "probe_r3_sp_grad.json")
    with open(path) as f:
        d = json.load(f)
    loc = d["localization"]
    assert loc["train_mode_forward_max_diff_f64"] < 1e-9
    assert loc["eval_mode_grad_max_diff_f64"] < 1e-9
    assert loc["divergent_leaves_all_dw"] is True
    assert loc["any_pw_or_dense_leaf_divergent"] is False
    assert max(r["worst_abs_grad_diff_f64"] for r in d["rows"]) > 1e-3


def test_trainer_rejects_space_mesh():
    """Training must refuse a 'space' mesh axis: dw-conv weight grads
    diverge under SPMD spatial partitioning at degenerate extents (up
    to 2.2 abs in f64, docs/probe_r3_sp_grad.json) and the trigger
    depends on partitioner strategy, so it cannot be shape-validated
    away.  'space' is an inference/eval axis."""
    from fastdepth_tpu.train import Trainer

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="space"):
        Trainer(model, params, TrainConfig(lr=0.05), mesh=make_mesh_2d(2, 4))
