"""Probe: dw5x5 as an explicit 25-tap shifted-multiply-add stencil.

calibrate_hbm.py (docs/probe_r3_hbm.json) measured XLA's native dw5x5
lowering at 213-377 GB/s equivalent — 2.8x below the elementwise ceiling
at the same shapes — making the dw convs the binding per-op ceiling in
dec3-5.  Unprobed idea from the r2 verdict: express the dw conv as
  sum_{dy,dx} w[dy,dx] * pad(x)[:, dy:dy+H, dx:dx+W, :]
i.e. 25 statically-shifted elementwise multiply-adds.  XLA fuses static
slices of one padded buffer into a single output loop, so IF the fusion
materializes only pad(x) and the output, traffic approaches 2 passes and
the op becomes elementwise-ceiling-bound instead of dw-lowering-bound.

Measures (bf16, b128, barrier-chained like calibrate_hbm.py):
  native dw vs stencil dw at dec3/dec4/dec5 geometries, value parity,
  then the full pruned forward with stencil dw in dec stages vs prod.

Run (single-tenant TPU):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python -u scripts/probe_dw_stencil.py > /tmp/probe_dw_stencil.log 2>&1
"""
import json
import os
import time

import numpy as np

import jax

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from fastdepth_tpu.engine.benchmark import setup_compile_cache  # noqa: E402

setup_compile_cache()

import jax.numpy as jnp
from jax import lax

from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.ops import blocks as B

K = 16
CALLS = 30
RES = {"K": K, "calls": CALLS, "rows": []}
rng = np.random.RandomState(0)


def dw_stencil(x, w, bias=None):
    """dw kxk stride-1 SAME as 25 shifted elementwise MAs. w: (kh,kw,1,c)."""
    kh, kw = w.shape[:2]
    ph, pw_ = (kh - 1) // 2, (kw - 1) // 2
    n, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw_, pw_), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            term = xp[:, dy : dy + h, dx : dx + wd, :] * w[dy, dx, 0]
            acc = term if acc is None else acc + term
    if bias is not None:
        acc = acc + bias
    return acc


def chain(fn, x, *args):
    y = x
    for _ in range(K):
        y = lax.optimization_barrier(fn(y, *args))
    return y


def bench(name, fn, args):
    t0 = time.time()
    f = jax.jit(fn)
    stats = time_pipelined(f, args, warmup=3, calls=CALLS)
    us = stats["mean_s"] / K * 1e6
    RES["rows"].append({"name": name, "per_pass_us": round(us, 1)})
    print(f"{name:40s} {us:>9.1f} us/pass [{time.time()-t0:.0f}s]", flush=True)
    return us


SHAPES = (("dec4 120ch@56^2", (128, 56, 56, 120)),
          ("dec5 56ch@112^2", (128, 112, 112, 56)),
          ("dec3 256ch@28^2", (128, 28, 28, 256)))

for name, shp in SHAPES:
    c = shp[-1]
    x = jnp.asarray(rng.rand(*shp), jnp.bfloat16)
    w = jnp.asarray(rng.rand(5, 5, 1, c) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.rand(c) * 0.1, jnp.bfloat16)

    # parity first (fp32 to judge the math, not rounding)
    xf = x[:2].astype(jnp.float32)
    wf, bf = w.astype(jnp.float32), b.astype(jnp.float32)
    ref = jax.jit(lambda x, w, b: B.depthwise_conv2d(x, w, bias=b))(xf, wf, bf)
    got = jax.jit(dw_stencil)(xf, wf, bf)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"{name}: stencil parity max|diff| = {err:.2e}", flush=True)
    assert err < 1e-4, err

    t_native = bench(f"native dw {name}",
                     lambda y, w, b: chain(
                         lambda t: B.relu(B.depthwise_conv2d(t, w, bias=b)), y),
                     (x, w, b))
    t_sten = bench(f"stencil dw {name}",
                   lambda y, w, b: chain(
                       lambda t: B.relu(dw_stencil(t, w, b)), y),
                   (x, w, b))
    RES["rows"].append({"name": f"speedup {name}",
                        "native_over_stencil": round(t_native / t_sten, 3)})
    print(f"  -> stencil is {t_native / t_sten:.2f}x native", flush=True)

out = os.path.join(repo, "docs", "probe_r3_dw_stencil.json")
with open(out, "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
