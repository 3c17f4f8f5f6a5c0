"""Subprocess helper (run with JAX_ENABLE_X64=1): proves the data-parallel
gradient over an 8-device mesh equals the single-device batch gradient in
float64 — i.e. the SPMD program is semantically identical and f32 deltas
seen in-process are summation-order noise only.

(The 2-D (data, space) mesh is deliberately NOT proven here: dw-conv
weight grads diverge under SPMD spatial partitioning at degenerate
extents — docs/probe_r3_sp_grad.json — so the trainer rejects 'space'
meshes outright; spatial partitioning is an inference/eval axis.)"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from fastdepth_tpu.config import ModelConfig  # noqa: E402
from fastdepth_tpu.models import build  # noqa: E402
from fastdepth_tpu.parallel import make_mesh  # noqa: E402
from fastdepth_tpu.parallel.mesh import put_sharded  # noqa: E402
from fastdepth_tpu.train.loss import masked_l1_loss  # noqa: E402


def main():
    enc = (4, 6, 8, 10, 12, 14, 16, 16, 16, 16, 16, 16, 20, 24)
    dec = (18, 14, 10, 6, 4)
    model = build(ModelConfig(encoder_channels=enc, decoder_channels=dec))
    params = jax.tree.map(
        lambda a: a.astype(jnp.float64), model.init(jax.random.PRNGKey(1))
    )
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float64)
    depth = jnp.asarray(rng.rand(8, 32, 32, 1) * 5 + 0.5, jnp.float64)

    def loss_fn(p, rgb, depth):
        return masked_l1_loss(model.apply(p, rgb, train=True, stats={}), depth)

    g1 = jax.jit(jax.grad(loss_fn))(params, rgb, depth)

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    g2 = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(jax.tree.map(lambda _: repl, params), data, data),
    )(jax.device_put(params, repl), put_sharded(rgb, mesh), put_sharded(depth, mesh))

    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9, rtol=1e-7)
    print("MESH_EQUIV_OK")

    # Gradient ACCUMULATION over the mesh: the real step function
    # (make_train_step(accum_steps=2, mesh=...) — scan over microbatches,
    # averaged update, sequential BN-stat merge, microbatches pinned to
    # P(None, 'data')) must produce identical updated params mesh vs
    # single-device in f64.  Without the sharding pin this check FAILS at
    # the 1e-2 level: the partitioner re-shards the reshaped microbatch
    # tensor spatially and hits the dw-conv-grad divergence
    # (docs/probe_r3_sp_grad.json) — this line is the regression guard.
    # Batch 16: the microbatch (8) must span the 8-device data axis.
    from fastdepth_tpu.config import TrainConfig  # noqa: E402
    from fastdepth_tpu.train.trainer import make_train_step, sgd_init  # noqa: E402

    rgb16 = jnp.asarray(rng.rand(16, 32, 32, 3), jnp.float64)
    depth16 = jnp.asarray(rng.rand(16, 32, 32, 1) * 5 + 0.5, jnp.float64)
    tc = TrainConfig(lr=0.05, weight_decay=1e-4)
    step_single = make_train_step(model, tc, accum_steps=2)
    step_mesh = make_train_step(model, tc, accum_steps=2, mesh=mesh)
    lr = jnp.asarray(0.05, jnp.float64)
    s1 = sgd_init(params)
    s1, l1 = jax.jit(step_single)(s1, rgb16, depth16, lr)

    state0 = sgd_init(jax.device_put(params, repl))
    state_sh = jax.tree.map(
        lambda _: repl, state0, is_leaf=lambda x: isinstance(x, jax.Array)
    )
    s2, l2 = jax.jit(
        step_mesh,
        in_shardings=(state_sh, data, data, None),
        out_shardings=(state_sh, repl),
    )(state0, put_sharded(rgb16, mesh), put_sharded(depth16, mesh), lr)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-9)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9, rtol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.momentum), jax.tree.leaves(s2.momentum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9, rtol=1e-7)
    print("ACCUM_MESH_EQUIV_OK")


if __name__ == "__main__":
    main()
