"""Price the 'space' axis: halo-exchange traffic of the spatially
partitioned forward, from the compiled SPMD module itself.

For each S-way height sharding of the full-width pruned flagship at
224x224/b1, this compiles the forward under a pure-'space' mesh and
sums what the partitioner actually emits: every collective-permute
(halo rows) and all-gather (the 7x7 bottleneck stages, where gathering
beats halo exchange) with its wire shape.  From the totals it derives
the parameter the sandbox cannot measure directly (one real chip, no
ICI): the BREAK-EVEN ICI bandwidth at which S-way spatial sharding
starts winning latency, i.e.

    bw_breakeven(S) = halo_bytes_per_device(S) / (t1 * (1 - 1/S))

with t1 = the measured single-chip b1 device compute time.  Any ICI
faster than that makes the axis profitable (ignoring the per-hop
latency floor, reported separately as the sequential collective count).

The partitioning decisions come from the same GSPMD passes TPU uses;
the CPU backend only changes the leaf kernels, not the sharded program
structure (same caveat as scripts/probe_sp_grad.py).

Writes docs/spatial_halo_r3.json.  Run:
  python scripts/analyze_spatial_halo.py
"""

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fastdepth_tpu.config import FASTDEPTH_PRUNED  # noqa: E402
from fastdepth_tpu.models import build  # noqa: E402
from fastdepth_tpu.parallel import make_mesh, shard_activations  # noqa: E402
from fastdepth_tpu.parallel.mesh import put_replicated, put_sharded  # noqa: E402

# measured single-chip b1 device compute, bf16 opt path, in-graph chained
# (docs/b1_latency.md) — the compute each extra shard would divide
T1_B1_US = 274.8

_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
          "f64": 8, "s8": 1, "u8": 1}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _collect(hlo_text: str, n_shards: int):
    """Per-device wire bytes of every halo/gather collective in the
    compiled module.  A collective-permute's result shape is fully
    received over the wire; an all-gather's result includes the
    device's OWN shard, so only (S-1)/S of it travels."""
    if re.search(r"(collective-permute|all-gather)-(start|done)", hlo_text):
        raise NotImplementedError(
            "async collective forms in the module; extend the parser "
            "before trusting the byte totals")
    rows = {}
    n_seen = {"collective-permute": 0, "all-gather": 0}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?\S+ = (\w+\[[\d,]*\][^ ]*) "
                     r"(collective-permute|all-gather)\(", line)
        if not m:
            continue
        shape_s, kind = m.groups()
        sm = _SHAPE_RE.match(shape_s)
        dtype, dims = sm.group(1), sm.group(2)
        shape = tuple(int(d) for d in dims.split(",")) if dims else ()
        nbytes = int(np.prod(shape)) * _BYTES[dtype]
        wire = nbytes if kind == "collective-permute" \
            else nbytes * (n_shards - 1) // n_shards
        key = (kind, dtype, shape)
        if key not in rows:
            rows[key] = {"kind": kind, "dtype": dtype, "shape": list(shape),
                         "count": 0, "result_bytes_each": nbytes,
                         "wire_bytes_each": wire}
        rows[key]["count"] += 1
        n_seen[kind] += 1
    # completeness guard: every textual occurrence of the op must have
    # been parsed (a format drift would otherwise silently undercount)
    for kind, n in n_seen.items():
        n_text = len(re.findall(rf" {kind}\(", hlo_text))
        if n != n_text:
            raise RuntimeError(
                f"parsed {n} {kind} ops but the module text contains "
                f"{n_text}; parser out of date")
    out = sorted(rows.values(), key=lambda r: -r["wire_bytes_each"] * r["count"])
    total = sum(r["wire_bytes_each"] * r["count"] for r in out)
    n_cp = sum(r["count"] for r in out if r["kind"] == "collective-permute")
    n_ag = sum(r["count"] for r in out if r["kind"] == "all-gather")
    return out, total, n_cp, n_ag


def main():
    model = build(FASTDEPTH_PRUNED)
    params = model.fold(model.init(jax.random.PRNGKey(0)))
    # fp32: the CPU backend upcasts bf16 convs, so an fp32 module is the
    # byte count the module actually carries here; bf16 serving halves
    # every wire shape (break-even bandwidth halves with it)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)

    results = []
    for s in (2, 4, 8):
        mesh = make_mesh(s, "space")
        act = shard_activations(mesh)
        params_r = put_replicated(params, mesh)
        f = jax.jit(
            model.apply,
            in_shardings=(jax.tree.map(lambda a: a.sharding, params_r), act),
            out_shardings=act,
        )
        txt = f.lower(params_r, put_sharded(x, mesh)).compile().as_text()
        rows, total, n_cp, n_ag = _collect(txt, s)
        saved_us = T1_B1_US * (1 - 1 / s)
        results.append({
            "space_shards": s,
            "halo_bytes_per_device": total,
            "collective_permutes": n_cp,
            "all_gathers": n_ag,
            "compute_saved_us_vs_single": round(saved_us, 1),
            "breakeven_ici_GBs": round(total / (saved_us * 1e-6) / 1e9, 2),
            "by_shape": rows,
        })
        print(f"S={s}: {total / 1e6:.3f} MB halo/device over {n_cp} "
              f"collective-permutes + {n_ag} all-gathers; break-even ICI "
              f"{results[-1]['breakeven_ici_GBs']} GB/s "
              f"(saves {saved_us:.0f} us compute)")

    out = {
        "what": "per-device halo/gather wire bytes of the spatially "
                "partitioned full-width forward (224^2 b1 fp32, folded), "
                "summed from the compiled SPMD module; break-even ICI "
                "bandwidth vs the measured single-chip b1 compute "
                "(bf16 serving halves every wire shape)",
        "t1_b1_us": T1_B1_US,
        "t1_source": "docs/b1_latency.md (bf16 opt, in-graph chained)",
        "note": "GSPMD partitioning on the CPU backend; TPU shares the "
                "partitioner passes, only leaf kernels differ",
        "rows": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "spatial_halo_r3.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
