"""Gather-free lookup formulations, measured on chip (r5 follow-up).

docs/probe_r5_device_gathers.json established the ~12 ns/index floor
for XLA per-element gathers; kernel_notes r5 rejected the gather-free
reformulations by ARITHMETIC from those stage costs.  This probe
upgrades the record to measurements — and would flip the device-aug
verdict if any formulation beats the floor by enough:

  1D lookups, 256-entry table (the jitter/255 class):
    take_256          jnp.take baseline (the measured floor)
    onehot_dot        (v[...,None] == iota(256)) @ lut — MXU matmul;
                      tests whether XLA fuses the one-hot generator into
                      the dot operand or materializes N x 256
    select_sum        unrolled sum_k lut[k] * (v == k) — one fused VPU
                      elementwise DAG, no gather unit at all
    select_sum_bt     per-image tables (B, 256): sum_k lut[:, k, None] *
                      (v == k) — the jitter-slot shape
    onehot_dot_bt     einsum('bpk,bk->bp') batched one-hot dot

  2D lookup, (256, 256) per-image grids (the saturation slot):
    sat_two_dots      einsum('bpk,bkv->bpv') row-select then
                      sum_v rows * onehot(v) value-select

  slice-packed spatial gather (the composed-geometry class):
    block_gather_16   one gather index per 16 consecutive output px
                      (32-px contiguous slices) + 16-way select_sum on
                      host-shipped in-slice offsets — only exact when
                      offsets fit the slice, which rotation breaks per
                      row; measured here as the mechanism's cost bound

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -u \
       scripts/probe_r5_lut_alternatives.py [--out docs/probe_r5_lut_alternatives.json]
"""

import argparse
import json
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=32)
p.add_argument("--calls", type=int, default=10)
p.add_argument("--out", default="/tmp/probe_r5_lut_alternatives.json")
args = p.parse_args()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastdepth_tpu.engine.benchmark import setup_compile_cache, sync  # noqa: E402

setup_compile_cache()

b = args.batch
n = 224 * 224 * 3  # per-item lookup count (rgb channels)
npx = 224 * 224
rng = np.random.RandomState(0)

v = jnp.asarray(rng.randint(0, 256, (b, n)), jnp.uint8)
lut = jnp.asarray(rng.rand(256), jnp.float32)
lut_b = jnp.asarray(rng.rand(b, 256), jnp.float32)
grid_b = jnp.asarray(rng.rand(b, 256, 256), jnp.float32)
lpx = jnp.asarray(rng.randint(0, 256, (b, npx)), jnp.int32)

hw = 480 * 640
raw32 = jnp.asarray(
    rng.randint(0, 2**31, (b, hw), dtype=np.int64).astype(np.uint32))
nblk = npx // 16
starts = jnp.asarray(rng.randint(0, hw - 32, (b, nblk)), jnp.int32)
offs = jnp.asarray(rng.randint(0, 16, (b, npx)), jnp.int32)


def take_256(v):
    return jnp.take(lut, v.astype(jnp.int32))


def onehot_dot(v):
    oh = (v[..., None] == jnp.arange(256, dtype=jnp.int32)
          ).astype(jnp.bfloat16)
    return oh @ lut.astype(jnp.bfloat16)


def select_sum(v):
    vi = v.astype(jnp.int32)
    acc = jnp.zeros(v.shape, jnp.float32)
    for k in range(256):
        acc = acc + lut[k] * (vi == k)
    return acc


def select_sum_bt(v):
    vi = v.astype(jnp.int32)
    acc = jnp.zeros(v.shape, jnp.float32)
    for k in range(256):
        acc = acc + lut_b[:, k, None] * (vi == k)
    return acc


def onehot_dot_bt(v):
    oh = (v[..., None] == jnp.arange(256, dtype=jnp.int32)
          ).astype(jnp.bfloat16)
    return jnp.einsum("bpk,bk->bp", oh, lut_b.astype(jnp.bfloat16))


def sat_two_dots(lpx, v):
    ohl = (lpx[..., None] == jnp.arange(256, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    rows = jnp.einsum("bpk,bkv->bpv", ohl,
                      grid_b.astype(jnp.bfloat16))     # (B, npx, 256)
    vv = v.reshape(b, npx, 3).astype(jnp.int32)
    ohv = (vv[..., None] == jnp.arange(256, dtype=jnp.int32)
           ).astype(jnp.bfloat16)                       # (B, npx, 3, 256)
    return jnp.einsum("bpv,bpcv->bpc", rows, ohv)


def block_gather_16(raw32, starts, offs):
    # one 32-element contiguous slice per 16 output px, then a 16-way
    # select over host-shipped in-slice offsets (VPU, no gather unit)
    def per_item(a, s):
        g = jax.vmap(lambda st: jax.lax.dynamic_slice(a, (st,), (32,)))(s)
        return g  # (nblk, 32)

    sl = jax.vmap(per_item)(raw32, starts)              # (B, nblk, 32)
    sl = sl.reshape(b, nblk, 32)
    out = jnp.zeros((b, npx), jnp.uint32)
    blk = sl.reshape(b, nblk, 1, 32)
    blk16 = jnp.broadcast_to(blk, (b, nblk, 16, 32)).reshape(b, npx, 32)
    for j in range(16):
        out = out + jnp.where(offs == j, blk16[..., j], jnp.uint32(0))
    return out


stages = {
    "take_256": (take_256, (v,)),
    "onehot_dot": (onehot_dot, (v,)),
    "select_sum": (select_sum, (v,)),
    "select_sum_bt": (select_sum_bt, (v,)),
    "onehot_dot_bt": (onehot_dot_bt, (v,)),
    "sat_two_dots": (sat_two_dots, (lpx, v)),
    "block_gather_16": (block_gather_16, (raw32, starts, offs)),
}

results = {"batch": b, "calls": args.calls, "lookups_per_call": b * n,
           "rows": {}, "errors": {}}
for tag, (fn, a) in stages.items():
    try:
        jf = jax.jit(fn)
        for _ in range(3):
            out = jf(*a)
        sync(out)
        t0 = time.time()
        for _ in range(args.calls):
            out = jf(*a)
        sync(out)
        ms = (time.time() - t0) / args.calls * 1e3
        results["rows"][tag] = round(ms, 2)
        print(json.dumps({tag: results["rows"][tag]}), flush=True)
    except Exception as e:  # OOM / compile failure is itself the datum
        results["errors"][tag] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({tag: results["errors"][tag]}), flush=True)

with open(args.out, "w") as f:
    json.dump(results, f, indent=1)
    f.write("\n")
print("wrote", args.out)
