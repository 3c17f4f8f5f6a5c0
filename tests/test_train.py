"""Training subsystem tests: masked L1, SGD step semantics vs torch,
BN stat updates, and mesh data-parallel == single-device equivalence."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fastdepth_tpu.config import ModelConfig, TrainConfig
from fastdepth_tpu.models import build
from fastdepth_tpu.train import Trainer, masked_l1_loss, sgd_init
from fastdepth_tpu.train.trainer import make_train_step, step_lr

TINY_ENC = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
TINY_DEC_ADD = (18, 14, 10, 6, 4)
CFG = ModelConfig(encoder_channels=TINY_ENC, decoder_channels=TINY_DEC_ADD)


def _data(rng, n=4, hw=32):
    rgb = rng.rand(n, hw, hw, 3).astype(np.float32)
    depth = (rng.rand(n, hw, hw, 1) * 5 + 0.5).astype(np.float32)
    depth[0, :4, :4, 0] = 0.0  # holes must be masked
    return jnp.asarray(rgb), jnp.asarray(depth)


def test_masked_l1_ignores_invalid(rng):
    pred = jnp.ones((1, 4, 4, 1)) * 2.0
    tgt = jnp.zeros((1, 4, 4, 1)).at[0, 0, 0, 0].set(3.0)
    # only one valid pixel: |2 - 3| = 1
    np.testing.assert_allclose(float(masked_l1_loss(pred, tgt)), 1.0)


def test_sgd_momentum_matches_torch(rng):
    """Our SGD update == torch.optim.SGD(momentum, weight_decay) on a
    conv weight."""
    w0 = rng.randn(3, 3, 2, 4).astype(np.float32)
    g = rng.randn(3, 3, 2, 4).astype(np.float32)
    lr, mom, wd = 0.1, 0.9, 1e-2

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=lr, momentum=mom, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # replicate with our update rule
    p = jnp.asarray(w0)
    m = jnp.zeros_like(p)
    for _ in range(3):
        gd = jnp.asarray(g) + wd * p
        m = mom * m + gd
        p = p - lr * m
    np.testing.assert_allclose(wt.detach().numpy(), np.asarray(p), atol=1e-6)


def test_train_step_decreases_loss(rng):
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(0))
    tc = TrainConfig(lr=0.01, momentum=0.9, weight_decay=0.0)
    step = jax.jit(make_train_step(model, tc))
    state = sgd_init(params)
    rgb, depth = _data(rng)
    losses = []
    for _ in range(8):
        state, loss = step(state, rgb, depth, jnp.float32(tc.lr))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_training_converges_overfit(rng):
    """Multi-step convergence, not just one-step decrease: 300 steps on
    a fixed batch whose depth is a learnable low-frequency function of
    the rgb must overfit — loss down >5x, and delta1 through the real
    inference path (BN running stats folded, metrics module) above 0.9.
    Catches slow corruption a single step can't see (BN-momentum
    coupling, stat drift, optimizer state decay).  The target is
    box-blurred: a per-pixel white-noise target is unrepresentable
    through the 32x-downsampling encoder (finest skip tap is at H/2)
    and plateaus at delta1~0.8 regardless of training."""
    from scipy.ndimage import uniform_filter

    from fastdepth_tpu.metrics import evaluate_batch

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(3))
    tc = TrainConfig(lr=0.05, momentum=0.9, weight_decay=0.0)
    step = jax.jit(make_train_step(model, tc))
    state = sgd_init(params)
    rgb_np = rng.rand(4, 32, 32, 3).astype(np.float32)
    rgb = jnp.asarray(rgb_np)
    smooth = uniform_filter(rgb_np.mean(-1), size=(1, 11, 11), mode="nearest")
    depth = jnp.asarray(1.0 + 2.0 * smooth[..., None])
    first = None
    for _ in range(300):
        state, loss = step(state, rgb, depth, jnp.float32(tc.lr))
        if first is None:
            first = float(loss)
    last = float(loss)
    assert last < first / 5, (first, last)
    # settle the BN running stats at the final weights (lr=0 steps update
    # stats only) so the inference path sees the trained statistics
    for _ in range(60):
        state, _ = step(state, rgb, depth, jnp.float32(0.0))

    pred = model.apply(model.fold(state.params), rgb)
    delta1 = float(np.mean(np.asarray(evaluate_batch(pred, depth)["delta1"])))
    assert delta1 > 0.9, delta1


def test_train_step_updates_bn_stats(rng):
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(0))
    tc = TrainConfig(weight_decay=0.0)
    step = jax.jit(make_train_step(model, tc))
    state = sgd_init(params)
    rgb, depth = _data(rng)
    before = np.asarray(params["encoder"]["conv0"]["bn"]["mean"])
    state, _ = step(state, rgb, depth, jnp.float32(0.01))
    after = np.asarray(state.params["encoder"]["conv0"]["bn"]["mean"])
    assert not np.allclose(before, after)


def test_mesh_training_matches_single_device(rng):
    """One step data-parallel over 8 CPU devices == one step on one
    device (XLA psum == the single-device batch gradient).

    f32 comparisons are confounded by reduction-order noise under BN
    cancellation, so loss is checked here in f32 and the gradient
    equivalence is proven in f64 in a subprocess (x64 is a global flag)."""
    import subprocess
    import sys

    from fastdepth_tpu.parallel import make_mesh

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(1))
    tc = TrainConfig(lr=0.05, weight_decay=1e-4)
    rgb, depth = _data(rng, n=8)

    # independent param copies: the jitted step donates its state buffers
    copy = lambda t: jax.tree.map(jnp.array, t)
    t_single = Trainer(model, copy(params), tc, mesh=None)
    t_single.state, loss_s = t_single._step(
        t_single.state, rgb, depth, jnp.float32(0.05)
    )

    mesh = make_mesh(8)
    t_mesh = Trainer(model, copy(params), tc, mesh=mesh)
    from fastdepth_tpu.parallel.mesh import put_sharded

    t_mesh.state, loss_m = t_mesh._step(
        t_mesh.state, put_sharded(rgb, mesh), put_sharded(depth, mesh), jnp.float32(0.05)
    )
    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-5)
    w_s = np.asarray(t_single.state.params["encoder"]["conv0"]["w"])
    w_m = np.asarray(t_mesh.state.params["encoder"]["conv0"]["w"])
    # f32: identical up to BN-amplified summation-order noise
    np.testing.assert_allclose(w_s, w_m, atol=2e-2)

    import os

    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    proc = subprocess.run(
        [sys.executable, __file__.replace("test_train.py", "mesh_equiv_f64.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert "MESH_EQUIV_OK" in proc.stdout, proc.stdout + proc.stderr
    # and the gradient-ACCUMULATED step is mesh==single in f64 too
    assert "ACCUM_MESH_EQUIV_OK" in proc.stdout, proc.stdout + proc.stderr


def test_mesh_training_flagship_shape(rng):
    """The REAL flagship config (FASTDEPTH_PRUNED, 224x224) trains
    data-parallel on the 8-device mesh — toy shapes don't prove VMEM/
    layout behavior at production shape (VERDICT r1 #5)."""
    from fastdepth_tpu.config import FASTDEPTH_PRUNED
    from fastdepth_tpu.parallel import make_mesh
    from fastdepth_tpu.parallel.mesh import put_sharded

    model = build(FASTDEPTH_PRUNED)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    trainer = Trainer(model, params, TrainConfig(lr=0.01), mesh=mesh, remat=True)
    rgb = put_sharded(jnp.asarray(rng.rand(8, 224, 224, 3), jnp.float32), mesh)
    depth = put_sharded(
        jnp.asarray(rng.rand(8, 224, 224, 1) * 5 + 0.5, jnp.float32), mesh)
    losses = []
    for _ in range(2):
        trainer.state, loss = trainer._step(
            trainer.state, rgb, depth, jnp.float32(0.01))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)


def test_mesh_bf16_training_matches_single_device(rng):
    """Mixed precision composes with data parallelism: one bf16 step over
    the 8-device mesh tracks the single-device bf16 step (grads are psum'd
    in fp32 master precision — the cast lives inside the forward)."""
    from fastdepth_tpu.parallel import make_mesh
    from fastdepth_tpu.parallel.mesh import put_sharded

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(6))
    tc = TrainConfig(lr=0.05, weight_decay=1e-4)
    rgb, depth = _data(rng, n=8)
    copy = lambda t: jax.tree.map(jnp.array, t)

    t_single = Trainer(model, copy(params), tc, compute_dtype=jnp.bfloat16)
    t_single.state, loss_s = t_single._step(
        t_single.state, rgb, depth, jnp.float32(0.05))

    mesh = make_mesh(8)
    t_mesh = Trainer(model, copy(params), tc, mesh=mesh,
                     compute_dtype=jnp.bfloat16)
    t_mesh.state, loss_m = t_mesh._step(
        t_mesh.state, put_sharded(rgb, mesh), put_sharded(depth, mesh),
        jnp.float32(0.05))
    # LOSS parity only: psum reduction order perturbs the f32 BN moments
    # by ~1e-7, which flips a fraction of bf16 activation roundings, and
    # the chaotically-conditioned gradient (docs/probe_r3_bf16_grads.json)
    # turns those ulp flips into O(1) per-element weight-delta changes —
    # exactly as for bf16-vs-fp32.  The loss VALUE is well-conditioned
    # and must agree.
    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=3e-3)
    for leaf in jax.tree.leaves(t_mesh.state.params):
        assert leaf.dtype == jnp.float32
    # and the mesh step still optimizes: a second step reduces the loss
    t_mesh.state, loss_m2 = t_mesh._step(
        t_mesh.state, put_sharded(rgb, mesh), put_sharded(depth, mesh),
        jnp.float32(0.05))
    assert float(loss_m2) < float(loss_m)


def test_weight_decay_covers_all_trainable_params():
    """torch.optim.SGD(model.parameters(), weight_decay=wd) — the
    reference-era recipe — decays EVERY parameter: conv/fc weights,
    biases, and BN scale/bias.  BN running mean/var are buffers, never
    decayed."""
    import jax.tree_util as jtu

    from fastdepth_tpu.train.trainer import _is_decayed

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(0))
    decayed, spared = set(), set()
    for path, _ in jtu.tree_flatten_with_path(params)[0]:
        leaf = path[-1].key
        parent = path[-2].key if len(path) > 1 else ""
        (decayed if _is_decayed(path) else spared).add((parent, leaf))
    assert all(leaf in ("mean", "var") and parent == "bn"
               for parent, leaf in spared), spared
    assert ("bn", "scale") in decayed and ("bn", "bias") in decayed
    assert any(leaf == "w" for _, leaf in decayed)


def test_run_epoch_rejects_padded_batches(rng):
    """A padded final batch would feed zero rows into the BN batch
    statistics; run_epoch must refuse it with instructions rather than
    silently corrupt the running stats."""
    model = build(CFG)
    t = Trainer(model, model.init(jax.random.PRNGKey(0)), TrainConfig(lr=0.01))

    class _PaddedLoader:
        dataset = range(3)

        def __iter__(self):
            rgb = np.zeros((4, 32, 32, 3), np.float32)
            depth = np.ones((4, 32, 32, 1), np.float32)
            yield rgb, depth, 3  # 3 real rows in a batch of 4

        def __len__(self):
            return 1

    with pytest.raises(ValueError, match="padded"):
        t.run_epoch(_PaddedLoader(), 0, log=lambda *a: None)


def test_loader_iterators_are_isolated(rng):
    """Two live iterators over ONE BatchLoader must not shut down or
    submit into each other's worker pool (regression: the pool was
    shared instance state)."""
    from fastdepth_tpu.data.loader import BatchLoader

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.float32),
                    np.full((4, 4, 1), i, np.float32))

    loader = BatchLoader(_DS(), batch_size=2, num_workers=2, prefetch=1)
    it1 = iter(loader)
    next(it1)
    it2 = iter(loader)          # second epoch starts while it1 lives
    del it1                     # finalize it1 (its pool, not it2's)
    import gc

    gc.collect()
    batches = list(it2)         # must complete the full epoch
    assert len(batches) == 4
    assert all(c == 2 for _, _, c in batches)


def test_step_lr_schedule():
    tc = TrainConfig(lr=0.01, lr_decay_step=5, lr_decay_gamma=0.2)
    assert step_lr(tc, 0) == 0.01
    assert abs(step_lr(tc, 5) - 0.002) < 1e-12
    assert abs(step_lr(tc, 10) - 0.0004) < 1e-12
    # non-positive step = "no decay", not ZeroDivisionError
    assert step_lr(TrainConfig(lr=0.01, lr_decay_step=0), 7) == 0.01


def test_remat_step_matches_plain(rng):
    """jax.checkpoint rematerialization changes memory, not math."""
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(2))
    tc = TrainConfig(lr=0.01, weight_decay=0.0)
    rgb, depth = _data(rng)
    copy = lambda: jax.tree.map(jnp.array, params)
    s1 = sgd_init(copy())
    s2 = sgd_init(copy())
    step_plain = jax.jit(make_train_step(model, tc, remat=False))
    step_remat = jax.jit(make_train_step(model, tc, remat=True))
    s1, l1 = step_plain(s1, rgb, depth, jnp.float32(0.01))
    s2, l2 = step_remat(s2, rgb, depth, jnp.float32(0.01))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["encoder"]["conv0"]["w"]),
        np.asarray(s2.params["encoder"]["conv0"]["w"]), atol=1e-6)


def test_bf16_mixed_precision_step(rng):
    """Mixed-precision training (compute_dtype=bf16): the forward/backward
    run in bf16 but master weights, momentum and BN running stats stay
    fp32, the loss stays close to the fp32 step's, and training still
    converges."""
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(4))
    tc = TrainConfig(lr=0.01, momentum=0.9, weight_decay=1e-4)
    rgb, depth = _data(rng)
    copy = lambda: jax.tree.map(jnp.array, params)

    step32 = jax.jit(make_train_step(model, tc))
    step16 = jax.jit(make_train_step(model, tc, compute_dtype=jnp.bfloat16))
    s32, l32 = step32(sgd_init(copy()), rgb, depth, jnp.float32(0.01))
    s16, l16 = step16(sgd_init(copy()), rgb, depth, jnp.float32(0.01))

    # every leaf of the state is still fp32 — bf16 never leaks into the
    # master copies (incl. BN running stats merged from the bf16 forward)
    for leaf in jax.tree.leaves(s16.params) + jax.tree.leaves(s16.momentum):
        assert leaf.dtype == jnp.float32
    # bf16 step tracks the fp32 step at the LOSS level (bf16 has ~3
    # decimal digits).  Per-element weight deltas are deliberately NOT
    # compared: measured in f64 (docs/probe_r3_bf16_grads.json), a
    # bf16-magnitude (2^-8) relative perturbation of weights+input alone
    # moves this loss's gradient to cos~0.38 — the single-step gradient
    # DIRECTION at random init is chaotically conditioned (L1 sign grads
    # + BN cancellation), so direction equality is not a property any
    # correct bf16 implementation could have.  What mixed precision does
    # guarantee — and what is asserted — is loss-trajectory parity.
    np.testing.assert_allclose(float(l16), float(l32), rtol=3e-2)
    # BN running stats were updated (not left at init) and are finite
    m0 = np.asarray(params["encoder"]["conv0"]["bn"]["mean"])
    m1 = np.asarray(s16.params["encoder"]["conv0"]["bn"]["mean"])
    assert not np.allclose(m0, m1)
    assert np.all(np.isfinite(m1))

    # trajectory parity: 8 steps in each precision reduce the loss and
    # land within 5% of each other
    s32t, s16t = sgd_init(copy()), sgd_init(copy())
    l32s, l16s = [], []
    for _ in range(8):
        s32t, a = step32(s32t, rgb, depth, jnp.float32(0.01))
        s16t, b = step16(s16t, rgb, depth, jnp.float32(0.01))
        l32s.append(float(a))
        l16s.append(float(b))
    assert l16s[-1] < l16s[0]
    np.testing.assert_allclose(l16s[-1], l32s[-1], rtol=5e-2)


def test_bf16_remat_matches_plain(rng):
    """remat composes with mixed precision: the cast lives inside the
    checkpointed forward, so recompute happens in bf16 and the result
    matches the non-remat bf16 step."""
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(5))
    tc = TrainConfig(lr=0.01, weight_decay=0.0)
    rgb, depth = _data(rng)
    copy = lambda: jax.tree.map(jnp.array, params)
    s1, l1 = jax.jit(make_train_step(model, tc, compute_dtype=jnp.bfloat16))(
        sgd_init(copy()), rgb, depth, jnp.float32(0.01))
    s2, l2 = jax.jit(make_train_step(model, tc, remat=True,
                                     compute_dtype=jnp.bfloat16))(
        sgd_init(copy()), rgb, depth, jnp.float32(0.01))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["encoder"]["conv0"]["w"]),
        np.asarray(s2.params["encoder"]["conv0"]["w"]), atol=1e-5)


def test_nonfinite_batch_skipped(rng):
    """A NaN batch must leave the ENTIRE state bit-identical: weights,
    BN running stats (merge gated on `finite`) and momentum (which must
    not absorb the weight-decay term on a skipped step)."""
    model = build(CFG)
    params = model.init(jax.random.PRNGKey(3))
    tc = TrainConfig(lr=0.05, weight_decay=1e-3)  # wd>0: the momentum trap
    step = jax.jit(make_train_step(model, tc))
    state = sgd_init(params)
    rgb, depth = _data(rng)
    bad_rgb = rgb.at[0, 0, 0, 0].set(jnp.nan)
    before_p = jax.tree.map(np.asarray, state.params)
    before_m = jax.tree.map(np.asarray, state.momentum)
    state, loss = step(state, bad_rgb, depth, jnp.float32(0.05))
    assert not np.isfinite(float(loss))
    for old, new in zip(jax.tree.leaves(before_p), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(old, np.asarray(new))
    for old, new in zip(jax.tree.leaves(before_m), jax.tree.leaves(state.momentum)):
        np.testing.assert_array_equal(old, np.asarray(new))
    # and a subsequent good batch still trains
    state, loss2 = step(state, rgb, depth, jnp.float32(0.05))
    assert np.isfinite(float(loss2))
    assert not np.allclose(
        np.asarray(state.params["encoder"]["conv0"]["w"]),
        before_p["encoder"]["conv0"]["w"])


def test_resume_bit_exact(rng, tmp_path):
    """Checkpoint/resume reproduces the exact trajectory: params after
    (2 steps, save, 1 step) == params after (load, restore, 1 step) —
    proving momentum buffers and the step counter survive the round trip
    (SURVEY.md §5 'Checkpoint / resume')."""
    from fastdepth_tpu.checkpoint.io import (
        load_train_checkpoint,
        save_train_checkpoint,
    )

    model = build(CFG)
    tc = TrainConfig(lr=0.05, momentum=0.9, weight_decay=1e-4)
    rgb, depth = _data(rng)

    t1 = Trainer(model, model.init(jax.random.PRNGKey(0)), tc)
    for _ in range(2):
        t1.state, _ = t1._step(t1.state, rgb, depth, jnp.float32(0.05))
    path = str(tmp_path / "ck.npz")
    save_train_checkpoint(path, t1.state, CFG, epoch=3,
                          best_result={"rmse": 1.25},
                          extra={"best_epoch": 2})
    t1.state, _ = t1._step(t1.state, rgb, depth, jnp.float32(0.05))

    tree, cfg2, meta = load_train_checkpoint(path)
    assert cfg2 == CFG
    assert meta["epoch"] == 3
    assert meta["best_result"] == {"rmse": 1.25}
    assert meta["extra"]["best_epoch"] == 2
    # different init: restore must fully overwrite params AND momentum
    t2 = Trainer(model, model.init(jax.random.PRNGKey(7)), tc)
    t2.restore(tree)
    assert int(t2.state.step) == 2
    t2.state, _ = t2._step(t2.state, rgb, depth, jnp.float32(0.05))
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_only_checkpoint_rejected_for_resume(tmp_path):
    """Resume must refuse a params-only checkpoint (model_best.npz) with
    a message pointing at the right file."""
    import pytest

    from fastdepth_tpu.checkpoint.io import load_train_checkpoint, save_checkpoint

    path = str(tmp_path / "p.npz")
    save_checkpoint(path, {"a": np.ones(2, np.float32)}, ModelConfig(), epoch=0)
    with pytest.raises(ValueError, match="params-only"):
        load_train_checkpoint(path)


def test_accum_step_matches_manual_microbatch_average(rng):
    """accum_steps=k == one update from the MEAN of k per-microbatch
    gradients, with BN running stats merged sequentially microbatch
    after microbatch (torch grad-accum semantics).  wd=0 and fresh
    momentum so the expected update is exactly p - lr*mean(g); the full
    param tree (incl. BN running stats) is re-derived with an explicit
    python loop and compared leaf-by-leaf."""
    from fastdepth_tpu.models import layers as L

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(4))
    tc = TrainConfig(lr=0.02, weight_decay=0.0)
    rgb, depth = _data(rng, n=4)
    k, mb = 2, 2
    lr = jnp.float32(0.02)

    def loss_of(p, r, d):
        stats = {}
        pred = model.apply(p, r, train=True, stats=stats)
        return masked_l1_loss(pred, d), stats

    p_c = params
    gsum = jax.tree.map(jnp.zeros_like, params)
    lsum = jnp.float32(0.0)
    last_st = {}
    for i in range(k):
        (li, st), gi = jax.value_and_grad(loss_of, has_aux=True)(
            p_c, rgb[i * mb:(i + 1) * mb], depth[i * mb:(i + 1) * mb])
        p_c = L.merge_stats(p_c, st)  # sequential running-stat thread
        last_st = st
        gsum = jax.tree.map(jnp.add, gsum, gi)
        lsum = lsum + li
    gavg = jax.tree.map(lambda g: g / k, gsum)
    expected_p = L.merge_stats(
        jax.tree.map(lambda p, g: p - lr * g, params, gavg), last_st)

    step = jax.jit(make_train_step(model, tc, accum_steps=k))
    state = sgd_init(jax.tree.map(jnp.array, params))
    state, loss = step(state, rgb, depth, lr)

    np.testing.assert_allclose(float(loss), float(lsum / k), rtol=1e-6)
    # rtol 1e-3: jitted-scan vs unjitted-loop f32 reduction-order noise
    # reaches ~4e-4 on BN batch moments; the semantics this test
    # discriminates (sequential merge vs fresh-stats merge) differ by
    # ~(1-m)*m*(batch_moment - old) ~ 1e-2, an order of magnitude above
    exp_flat = jax.tree_util.tree_flatten_with_path(expected_p)[0]
    for (path, e), n in zip(exp_flat, jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(n),
                                   rtol=1e-3, atol=1e-5, err_msg=str(path))
    # the momentum buffer holds exactly the averaged gradient
    for e, n in zip(jax.tree.leaves(gavg), jax.tree.leaves(state.momentum)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(n),
                                   rtol=1e-3, atol=1e-5)


def test_accum_rejects_mesh_sharded_batch_without_mesh(rng):
    """make_train_step(accum_steps>1, mesh=None) fed a batch sharded over
    several devices: without the mesh pin the partitioner may re-shard
    the microbatch reshape spatially (dw-conv grads diverge under spatial
    SPMD, docs/probe_r3_sp_grad.json) — the step must refuse the visible
    hazard instead of silently training wrong (ADVICE r3)."""
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fastdepth_tpu.parallel.mesh import DATA_AXIS, make_mesh

    model = build(CFG)
    tc = TrainConfig(lr=0.01)
    step = make_train_step(model, tc, accum_steps=2)  # mesh=None
    state = sgd_init(model.init(jax.random.PRNGKey(0)))
    rgb, depth = _data(rng, n=8)
    mesh = make_mesh(8)
    sharded_rgb = jax.device_put(rgb, NamedSharding(mesh, P(DATA_AXIS)))
    sharded_depth = jax.device_put(depth, NamedSharding(mesh, P(DATA_AXIS)))
    with pytest.raises(ValueError, match="mesh"):
        step(state, sharded_rgb, sharded_depth, jnp.float32(0.01))
    # single-device inputs stay accepted (the guard sees 1 device)
    state2, loss = step(state, rgb, depth, jnp.float32(0.01))
    assert np.isfinite(float(loss))

    # the PRODUCTION path: Trainer jits the step, and a jit tracer has no
    # .sharding, so the in-step guard is blind there — Trainer must run
    # the same concrete check host-side before dispatch
    from fastdepth_tpu.train.trainer import Trainer

    tr = Trainer(model, model.init(jax.random.PRNGKey(0)), tc,
                 accum_steps=2)  # mesh=None
    with pytest.raises(ValueError, match="mesh"):
        tr._step(tr.state, sharded_rgb, sharded_depth, jnp.float32(0.01))
    _, loss = tr._step(tr.state, rgb, depth, jnp.float32(0.01))
    assert np.isfinite(float(loss))


def test_accum_rejects_indivisible_batch(rng):
    """Unequal microbatches would silently skew BN moments and loss
    weighting — refuse at trace time."""
    import pytest

    model = build(CFG)
    tc = TrainConfig(lr=0.01)
    step = make_train_step(model, tc, accum_steps=3)
    state = sgd_init(model.init(jax.random.PRNGKey(0)))
    rgb, depth = _data(rng, n=4)
    with pytest.raises(ValueError, match="divisible"):
        step(state, rgb, depth, jnp.float32(0.01))
    with pytest.raises(ValueError, match="accum_steps"):
        make_train_step(model, tc, accum_steps=0)


def test_accum_nonfinite_microbatch_skips_update(rng):
    """A NaN in ANY microbatch poisons the accumulated loss, so the
    whole update must be skipped with the state left bit-identical
    (same contract as the unaccumulated step)."""
    model = build(CFG)
    tc = TrainConfig(lr=0.05, weight_decay=1e-3)
    step = jax.jit(make_train_step(model, tc, accum_steps=2))
    state = sgd_init(model.init(jax.random.PRNGKey(3)))
    rgb, depth = _data(rng, n=4)
    bad_rgb = rgb.at[3, 0, 0, 0].set(jnp.nan)  # NaN in the LAST microbatch
    before_p = jax.tree.map(np.asarray, state.params)
    state, loss = step(state, bad_rgb, depth, jnp.float32(0.05))
    assert not np.isfinite(float(loss))
    for old, new in zip(jax.tree.leaves(before_p), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(old, np.asarray(new))
    state, loss2 = step(state, rgb, depth, jnp.float32(0.05))
    assert np.isfinite(float(loss2))


def test_accum_mesh_matches_single_device(rng):
    """Gradient accumulation composes with the data mesh: each device
    scans its local microbatch rows, the psum happens once per
    microbatch inside the scan — result equals the single-device
    accumulated step (up to f32 reduction-order noise, same bound as
    the unaccumulated mesh test)."""
    from fastdepth_tpu.parallel import make_mesh
    from fastdepth_tpu.parallel.mesh import put_sharded

    model = build(CFG)
    params = model.init(jax.random.PRNGKey(1))
    tc = TrainConfig(lr=0.05, weight_decay=1e-4)
    rgb, depth = _data(rng, n=16)

    copy = lambda t: jax.tree.map(jnp.array, t)
    t_single = Trainer(model, copy(params), tc, accum_steps=2)
    t_single.state, loss_s = t_single._step(
        t_single.state, rgb, depth, jnp.float32(0.05))

    mesh = make_mesh(8)
    t_mesh = Trainer(model, copy(params), tc, mesh=mesh, accum_steps=2)
    t_mesh.state, loss_m = t_mesh._step(
        t_mesh.state, put_sharded(rgb, mesh), put_sharded(depth, mesh),
        jnp.float32(0.05))

    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-5)
    # f32 weights: BN-amplified summation-order noise compounds over the
    # two sequential microbatch forwards — measured up to ~7e-2 here
    # even though the SPMD program is EXACT (the identical geometry
    # passes at atol=1e-9 in f64: mesh_equiv_f64.py's
    # ACCUM_MESH_EQUIV_OK, run from test_mesh_training_matches_single_
    # device's subprocess — that line, not this one, is the regression
    # guard for the microbatch-sharding pin; without the P(None,'data')
    # pin the partitioner re-shards spatially and the f64 check fails at
    # the 1e-2 level via the dw-conv-grad divergence).
    np.testing.assert_allclose(
        np.asarray(t_single.state.params["encoder"]["conv0"]["w"]),
        np.asarray(t_mesh.state.params["encoder"]["conv0"]["w"]), atol=1e-1)


def test_accum_composes_with_remat_and_bf16(rng):
    """Smoke: accum_steps=2 + remat + bf16 mixed precision — the
    large-model memory stack — still trains (loss decreases over 6
    steps) and keeps master params in fp32."""
    model = build(CFG)
    tc = TrainConfig(lr=0.02, weight_decay=0.0)
    step = jax.jit(make_train_step(model, tc, remat=True,
                                   compute_dtype=jnp.bfloat16, accum_steps=2))
    state = sgd_init(model.init(jax.random.PRNGKey(5)))
    rgb, depth = _data(rng, n=4)
    losses = []
    for _ in range(6):
        state, loss = step(state, rgb, depth, jnp.float32(0.02))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert state.params["encoder"]["conv0"]["w"].dtype == jnp.float32
