"""Decoder-tail experiments: stages 4+5+head are ~32 of the 59 us/frame
(scripts/profile_marginal.py).  Their channels (120/56/16) underfill the
128-wide TPU lanes, so this probe times batch->channel *packing*: fold
P images into the channel dim (one transpose per packed operand), run
dw convs with P-tiled weights and pw convs as block-diagonal dense
matmuls (MXU has headroom: the whole decoder's pw work is <2% of peak),
unpack once at the head.

Also times each sub-op of the reference tail in isolation for
attribution.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
  python -u scripts/probe_dec_tail.py > /tmp/probe_dec_tail.log 2>&1
"""
import json
import os
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.ops import blocks as B

N = 128
DT = jnp.bfloat16
RES = {}
rng = np.random.RandomState(0)

# dec4: (N,56,56,120) -> pw 56, up, +x1(112^2,56); dec5: 56->16; head 16->1
y0 = jnp.asarray(rng.rand(N, 56, 56, 120), DT)
x1 = jnp.asarray(rng.rand(N, 112, 112, 56), DT)
w_dw4 = jnp.asarray(rng.rand(5, 5, 1, 120) * 0.1, DT)
b_dw4 = jnp.asarray(rng.rand(120) * 0.1, DT)
w_pw4 = jnp.asarray(rng.rand(1, 1, 120, 56) * 0.1, DT)
b_pw4 = jnp.asarray(rng.rand(56) * 0.1, DT)
w_dw5 = jnp.asarray(rng.rand(5, 5, 1, 56) * 0.1, DT)
b_dw5 = jnp.asarray(rng.rand(56) * 0.1, DT)
w_pw5 = jnp.asarray(rng.rand(1, 1, 56, 16) * 0.1, DT)
b_pw5 = jnp.asarray(rng.rand(16) * 0.1, DT)
w_h = jnp.asarray(rng.rand(1, 1, 16, 1) * 0.1, DT)
b_h = jnp.asarray(rng.rand(1) * 0.1, DT)


def bench(tag, fn, args, calls=30):
    t0 = time.time()
    try:
        stats = time_pipelined(fn, args, warmup=3, calls=calls)
        us = stats["mean_s"] / N * 1e6
        RES[tag] = round(us, 2)
        print(f"{tag}: {us:.2f} us/frame ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        RES[tag] = f"error: {type(e).__name__}"
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)


def tail_ref(y, x1):
    y = B.relu(B.depthwise_conv2d(y, w_dw4, bias=b_dw4))
    y = B.relu(B.conv2d(y, w_pw4, bias=b_pw4))
    y = B.upsample_nearest2x(y) + x1
    y = B.relu(B.depthwise_conv2d(y, w_dw5, bias=b_dw5))
    y = B.relu(B.conv2d(y, w_pw5, bias=b_pw5))
    y = B.relu(B.conv2d(y, w_h, bias=b_h))     # head at 112^2 (commuted)
    return B.upsample_nearest2x(y)


def pack(x, p):
    n, h, w, c = x.shape
    return x.reshape(n // p, p, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
        n // p, h, w, p * c)


def unpack(x, p):
    m, h, w, pc = x.shape
    return x.reshape(m, h, w, p, pc // p).transpose(0, 3, 1, 2, 4).reshape(
        m * p, h, w, pc // p)


def blockdiag(w, p):
    """(1,1,C,Co) -> (1,1,pC,pCo) block-diagonal."""
    c, co = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, p * c, p * co), w.dtype)
    for i in range(p):
        out = out.at[:, :, i * c:(i + 1) * c, i * co:(i + 1) * co].set(w)
    return out


def make_tail_packed(p):
    tdw4, tb4 = jnp.tile(w_dw4, (1, 1, 1, p)), jnp.tile(b_dw4, p)
    tpw4, tpb4 = blockdiag(w_pw4, p), jnp.tile(b_pw4, p)
    tdw5, tb5 = jnp.tile(w_dw5, (1, 1, 1, p)), jnp.tile(b_dw5, p)
    tpw5, tpb5 = blockdiag(w_pw5, p), jnp.tile(b_pw5, p)
    th, thb = blockdiag(w_h, p), jnp.tile(b_h, p)

    def tail(y, x1):
        y = pack(y, p)
        x1p = pack(x1, p)
        y = B.relu(B.depthwise_conv2d(y, tdw4, bias=tb4))
        y = B.relu(B.conv2d(y, tpw4, bias=tpb4))
        y = B.upsample_nearest2x(y) + x1p
        y = B.relu(B.depthwise_conv2d(y, tdw5, bias=tb5))
        y = B.relu(B.conv2d(y, tpw5, bias=tpb5))
        y = B.relu(B.conv2d(y, th, bias=thb))
        return B.upsample_nearest2x(unpack(y, p))
    return tail


# parity (small batch)
ref_small = np.asarray(jax.jit(tail_ref)(y0[:8], x1[:8]), np.float32)
for p in (2, 4, 8):
    got = np.asarray(jax.jit(make_tail_packed(p))(y0[:8], x1[:8]), np.float32)
    md = float(np.abs(ref_small - got).max())
    RES[f"parity_pack{p}"] = md
    print(f"parity pack{p}: maxdiff={md:.2e}", flush=True)

bench("tail_ref", jax.jit(tail_ref), (y0, x1))
for p in (2, 4, 8):
    bench(f"tail_pack{p}", jax.jit(make_tail_packed(p)), (y0, x1))

# ---- sub-op attribution (isolated, b128 — layouts may differ in context)
y4 = B.relu(B.depthwise_conv2d(y0, w_dw4, bias=b_dw4))
y4p = B.relu(B.conv2d(y4, w_pw4, bias=b_pw4))
z5 = B.upsample_nearest2x(y4p) + x1
z5d = B.relu(B.depthwise_conv2d(z5, w_dw5, bias=b_dw5))
z5p = B.relu(B.conv2d(z5d, w_pw5, bias=b_pw5))
jax.block_until_ready((y4, y4p, z5, z5d, z5p))
bench("iso_dw4", jax.jit(lambda a: B.depthwise_conv2d(a, w_dw4, bias=b_dw4)), (y0,))
bench("iso_pw4", jax.jit(lambda a: B.conv2d(a, w_pw4, bias=b_pw4)), (y4,))
bench("iso_up_add", jax.jit(lambda a, s: B.upsample_nearest2x(a) + s), (y4p, x1))
bench("iso_dw5", jax.jit(lambda a: B.depthwise_conv2d(a, w_dw5, bias=b_dw5)), (z5,))
bench("iso_pw5", jax.jit(lambda a: B.conv2d(a, w_pw5, bias=b_pw5)), (z5d,))
bench("iso_head112", jax.jit(lambda a: B.relu(B.conv2d(a, w_h, bias=b_h))), (z5p,))

# dw cost vs channel count at 112^2 (padding-waste hypothesis)
for c in (16, 56, 64, 112, 128, 256):
    xc = jnp.asarray(rng.rand(N, 112, 112, c), DT)
    wc = jnp.asarray(rng.rand(5, 5, 1, c) * 0.1, DT)
    bench(f"iso_dw5x5_112_c{c}",
          jax.jit(lambda a, wc=wc: B.depthwise_conv2d(a, wc)), (xc,))

with open("/tmp/probe_dec_tail.json", "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
