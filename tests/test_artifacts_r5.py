"""Round-5 committed artifacts stay internally consistent.

Same contract as test_host_pipeline_artifact_consistent /
test_spatial_halo_artifact_consistent: the measurement JSONs under
docs/ are load-bearing (VERDICT items closed against them, README and
kernel_notes quote them), so their internal arithmetic — stage sums,
derived percentages, knee criteria, window accounting — must keep
holding.  A regenerated artifact that contradicts its own claimed
derivation fails here instead of silently shipping."""

import json
import os

DOCS = os.path.join(os.path.dirname(__file__), os.pardir, "docs")


def _load(name):
    with open(os.path.join(DOCS, name)) as f:
        return json.load(f)


def test_gather_floor_probe_consistent():
    """docs/probe_r5_device_gathers.json: the stage decomposition must
    reproduce the end-to-end augment cost (that equality is WHY the
    per-index floor, not a composition detail, is the conclusion), and
    the per-index floor claims must hold within the rows."""
    d = _load("probe_r5_device_gathers.json")
    r = d["rows"]
    # full augment = rgb + depth + 3 jitter slots + /255 (stage sum
    # within 10%: dispatch overlap makes the sum slightly conservative)
    stage_sum = (r["rgb_u8_gather"] + r["depth_f32_gather"]
                 + 3 * r["jitter_slot_2d"] + r["unit_lut_take"])
    assert abs(stage_sum - r["full_augment"]) / r["full_augment"] < 0.10
    # table size must NOT matter (the floor follows index count): the
    # 256-entry lookups and the 65536-entry lookup are within 20%
    assert abs(r["small_lut_256"] - r["jitter_slot_2d"]) \
        / r["jitter_slot_2d"] < 0.20
    # VPU arithmetic on the same pixels is an order of magnitude cheaper
    assert r["pil_l_compute"] * 10 < r["unit_lut_take"]
    # 19.3M-index lookups cost ~3x the 6.4M-index gathers (same floor)
    assert r["unit_lut_take"] > 2 * r["rgb_u8_gather"]


def test_device_aug_bench_consistent():
    """docs/bench_train_device_aug_r5.json: the per-variant aug_cost_pct
    values derive from their own rows, the gather-free 'dot' LUT forms
    beat the all-gather forms by the documented ~4x, and the measured
    verdict (device aug still well below plain train fps — host aug
    stays the default above ~2 host cores) is what the docs claim."""
    d = _load("bench_train_device_aug_r5.json")
    plain = d["rows"]["plain_train_fps"]
    dot = d["rows"]["device_augment_dot_train_fps"]
    gather = d["rows"]["device_augment_gather_train_fps"]
    for tag, aug in (("dot", dot), ("gather", gather)):
        assert abs(d[f"aug_cost_pct_{tag}"]
                   - 100.0 * (1 - aug / plain)) < 0.05
    assert dot > 3 * gather      # the LUT-class recovery is real
    assert dot < plain / 4       # but the spatial gathers still bind


def test_lut_alternatives_probe_consistent():
    """docs/probe_r5_lut_alternatives.json: the measured gather-free
    formulations must keep the relationships the docs and the
    device_aug lut_impl default are argued from — select-sum / one-hot
    dots beat jnp.take by >5x on the 256-entry class, the 2-D
    grid two-dot beats the measured (256,256) gather-slot cost, and
    the slice-packed spatial mechanism LOSES (why spatial stays a
    plain gather)."""
    d = _load("probe_r5_lut_alternatives.json")
    r = d["rows"]
    assert not d["errors"]
    assert 5 * r["select_sum"] < r["take_256"]
    assert 5 * r["onehot_dot"] < r["take_256"]
    # 2-D (256,256) per-image lookup: the probe ran at b=32; the gather
    # form of the same slot measured 218 ms at b=128 in
    # probe_r5_device_gathers.json — compare at equal batch via x4
    g = _load("probe_r5_device_gathers.json")
    assert 4 * r["sat_two_dots"] < 0.6 * g["rows"]["jitter_slot_2d"]
    # block-packed spatial gather is a measured regression vs the
    # per-pixel spatial gather (4x: equal-batch scaling as above)
    assert r["block_gather_16"] * 4 > g["rows"]["rgb_u8_gather"]


def test_depth_frontier_consistent():
    """docs/b1_depth_frontier_r5.json: fps == frames/elapsed per row
    (via ms_per_frame), the knee satisfies its own criterion, and
    saturation throughput exceeds the knee's."""
    d = _load("b1_depth_frontier_r5.json")
    rows = {r["depth"]: r for r in d["rows"]}
    for r in d["rows"]:
        # fps and ms_per_frame are independently rounded in the artifact
        assert abs(r["fps"] * r["ms_per_frame"] - 1e3) / 1e3 < 0.02
    base_p50 = rows[1]["latency_ms"]["p50"]
    knee = d["knee"]["depth"]
    assert rows[knee]["latency_ms"]["p50"] <= 3 * base_p50
    # the knee is the LARGEST such depth
    larger = [dep for dep in rows if dep > knee
              and rows[dep]["latency_ms"]["p50"] <= 3 * base_p50]
    assert not larger
    assert max(rows) > knee  # a saturated row exists beyond the knee
    assert rows[max(rows)]["fps"] > rows[knee]["fps"]


def test_soak_taxonomy_consistent():
    """The three r5 soak artifacts must keep telling the documented
    story: loopback-to-chip == tunnel rate (the socket hop is free; the
    device tunnel is the bound), the null-forward stack rate is an
    order of magnitude above both, and window accounting adds up."""
    local = _load("soak_server_local_r5.json")
    null = _load("soak_server_null_r5.json")
    cpu = _load("soak_server_cpu_r5.json")
    r4 = _load("soak_r4.json")
    assert local["backend"] == "axon"
    assert null["backend"] == "null"
    assert cpu["backend"] == "cpu-tiny"
    # socket hop adds nothing: loopback-to-chip sits in the SAME
    # link-bound regime as the network-tunnel soak (same order — the
    # 5-15 MB/s tunnel itself drifts hour-to-hour: measured 47.8 and
    # 68.3 across two runs vs the tunnel's 47.7)
    assert 1 / 3 < local["mean_fps"] / r4["mean_fps"] < 3
    # the stack itself is >10x the link-bound rows (and the tiny-model
    # CPU control is compute-bound far below it)
    assert null["mean_fps"] > 10 * local["mean_fps"]
    assert null["mean_fps"] > 10 * cpu["mean_fps"]
    for d in (local, null, cpu):
        assert d["frames_total"] > 0
        assert len(d["windows"]) == len(d["window_fps"])


def test_rehearsal_report_consistent():
    """docs/parity_rehearsal_r5.json: the rerun command embeds the same
    expected row the report records, and the committed weights file it
    names exists."""
    d = _load("parity_rehearsal_r5.json")
    assert d["result"].startswith("PARITY OK")
    assert f"--expected-rmse {d['trained_rmse_m']:.6f}" in d["rerun"]
    assert f"--expected-delta1 {d['trained_delta1']:.6f}" in d["rerun"]
    assert os.path.exists(os.path.join(DOCS, os.pardir, d["weights"]))
    assert os.path.exists(os.path.join(DOCS, os.pardir, d["log"]))
    # the pin row the weights test asserts against is present and sane
    pin = d["val16_cpu_row"]
    assert 0 < pin["delta1"] < 1
    assert pin["rmse_mm"] > pin["mae_mm"] > 0
