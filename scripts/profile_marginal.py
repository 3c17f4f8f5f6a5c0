"""Marginal-cost per-layer profile of the pruned FastDepth forward.

Method: time the full jitted model, then for each layer time a variant
where THAT layer runs twice (on an epsilon-perturbed input, blended into
the output by a runtime scalar so XLA cannot CSE or DCE the duplicate).
The difference of pipelined means is the layer's marginal in-context
cost — unlike prefix-diff timing (docs/profile_r2_bf16_b128.json), the
duplicate keeps every layout and fusion decision of the production
graph, so the diff cannot go negative beyond noise.

Run (single-tenant TPU):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python -u scripts/profile_marginal.py > /tmp/profile_marginal.log 2>&1
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

from fastdepth_tpu.config import MOBILENET_STRIDES
from fastdepth_tpu.engine.benchmark import time_pipelined
from fastdepth_tpu.models import fastdepth_pruned
from fastdepth_tpu.ops import blocks as B

BATCH = 128
DTYPE = jnp.bfloat16
CALLS = 40

model = fastdepth_pruned()
params = jax.tree.map(lambda a: a.astype(DTYPE),
                      model.fold(model.init(jax.random.PRNGKey(0))))
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.rand(BATCH, 224, 224, 3), DTYPE)
eps0 = jnp.float32(1e-6)

# layer list: ("enc", i) for encoder block i in 0..13, ("dec", i) i in 1..6
LAYERS = [("enc", i) for i in range(14)] + [("dec", i) for i in range(1, 7)]


def enc_block(p, x, i):
    if i == 0:
        return B.relu6(B.conv2d(x, p["conv0"]["w"], stride=2, bias=p["conv0"]["b"]))
    blk = p[f"conv{i}"]
    s = MOBILENET_STRIDES[i - 1]
    y = B.relu6(B.depthwise_conv2d(x, blk["dw"]["w"], stride=s, bias=blk["dw"]["b"]))
    return B.relu6(B.conv2d(y, blk["pw"]["w"], bias=blk["pw"]["b"]))


def dec_stage(p, x, i, skip):
    pi = p[f"decode_conv{i}"]
    if i == 6:
        return B.relu(B.conv2d(x, pi["pw"]["w"], bias=pi["pw"]["b"]))
    y = B.relu(B.depthwise_conv2d(x, pi["dw"]["w"], bias=pi["dw"]["b"]))
    y = B.relu(B.conv2d(y, pi["pw"]["w"], bias=pi["pw"]["b"]))
    y = B.upsample_nearest2x(y)
    return y + skip if skip is not None else y


def forward(p, x, eps, dup=None):
    """dup=(kind, idx) duplicates that layer on a perturbed input and
    blends eps*(y2-y) into the flow (eps is a runtime value: no folding)."""

    def maybe_dup(kind, idx, fn, xin, y):
        if dup != (kind, idx):
            return y
        y2 = fn(xin * (1 + eps.astype(xin.dtype)))
        return y + eps.astype(y.dtype) * (y2 - y)

    enc = p["encoder"]
    y = x
    taps = {}
    for i in range(14):
        f = lambda t, i=i: enc_block(enc, t, i)
        out = f(y)
        out = maybe_dup("enc", i, f, y, out)
        y = out
        if i in (1, 3, 5):
            taps[i] = y
    dec = p["decoder"]
    skips = {2: taps[5], 3: taps[3], 4: taps[1]}
    for i in range(1, 7):
        skip = skips.get(i)
        f = lambda t, i=i, skip=skip: dec_stage(dec, t, i, skip)
        out = f(y)
        out = maybe_dup("dec", i, f, y, out)
        y = out
    return y


# correctness: hand-rolled forward == model.apply, dup variants equal base at eps=0
base_j = jax.jit(lambda p, x, e: forward(p, x, e))
ref = np.asarray(base_j(params, x0[:2], jnp.float32(0.0)))
mref = np.asarray(jax.jit(model.apply)(params, x0[:2]))
assert np.array_equal(ref, mref), "hand-rolled forward must match model.apply"
chk = np.asarray(jax.jit(lambda p, x, e: forward(p, x, e, dup=("dec", 4)))(
    params, x0[:2], jnp.float32(0.0)))
assert np.array_equal(ref, chk), "dup graph must be exact at eps=0"
print("parity ok", flush=True)

RES = {"batch": BATCH, "dtype": "bf16", "calls": CALLS, "layers": []}
t0 = time.time()
stats = time_pipelined(base_j, (params, x0, eps0), warmup=3, calls=CALLS)
base_us = stats["mean_s"] * 1e6
RES["base_us"] = base_us
print(f"base: {base_us:.0f} us ({base_us/BATCH:.2f} us/frame) "
      f"[{time.time()-t0:.0f}s]", flush=True)

for kind, idx in LAYERS:
    t0 = time.time()
    fn = jax.jit(lambda p, x, e, kind=kind, idx=idx:
                 forward(p, x, e, dup=(kind, idx)))
    stats = time_pipelined(fn, (params, x0, eps0), warmup=3, calls=CALLS)
    dup_us = stats["mean_s"] * 1e6
    marg = dup_us - base_us
    RES["layers"].append({"layer": f"{kind}{idx}", "marginal_us": round(marg, 1),
                          "marginal_us_per_frame": round(marg / BATCH, 3)})
    print(f"{kind}{idx}: +{marg:.0f} us ({marg/BATCH:.2f} us/frame) "
          f"[{time.time()-t0:.0f}s]", flush=True)

tot = sum(l["marginal_us"] for l in RES["layers"])
RES["sum_marginal_us"] = tot
print(f"sum of marginals: {tot:.0f} us vs base {base_us:.0f} us", flush=True)
with open("/tmp/profile_marginal.json", "w") as f:
    json.dump(RES, f, indent=1)
print(json.dumps(RES, indent=1), flush=True)
