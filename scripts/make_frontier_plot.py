"""Render docs/frontier.png from docs/frontier.json — the committed-plot
mirror of the reference's img/acc_fps_{gpu,cpu}.png (accuracy columns
live in docs/frontier.md; published accuracy exists only for the pruned
flagship, so the plot shows the throughput dimension: best fps per
model x dtype, annotated with the vs-TX2-GPU factor).

Colors: first two slots of the skill-validated default categorical
palette (blue/orange, adjacent-pair CVD-safe in light mode).
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
data = json.load(open(os.path.join(repo, "docs", "frontier.json")))
BASE = data.get("baseline_tx2_gpu_fps", 178.6)

best = {}
for r in data["rows"]:
    k = (r["model"], r["dtype"])
    if k not in best or r["fps"] > best[k]["fps"]:
        best[k] = r

models = ["mobilenet-nnconv5dw-skipadd-pruned", "mobilenet-nnconv5dw-skipadd",
          "mobilenet-nnconv5dw", "mobilenet-nnconv5"]
models = [m for m in models if any(k[0] == m for k in best)]
SERIES = [("bfloat16", "#2a78d6"), ("float32", "#eb6834")]

INK, MUTED, GRID = "#1f2430", "#5c6470", "#e4e7ec"
fig, ax = plt.subplots(figsize=(9, 4.2), dpi=150)
h = 0.34
for si, (dtype, color) in enumerate(SERIES):
    ys, xs, labels = [], [], []
    for mi, m in enumerate(models):
        r = best.get((m, dtype))
        if not r:
            continue
        y = mi + (si - 0.5) * (h + 0.04)
        ys.append(y)
        xs.append(r["fps"])
        labels.append(f"{r['fps']/1000:.1f}k  ({r['fps']/BASE:.0f}x TX2-GPU)")
    bars = ax.barh(ys, xs, height=h, color=color, label=dtype, zorder=3)
    for y, x, lab in zip(ys, xs, labels):
        ax.text(x + 250, y, lab, va="center", ha="left", fontsize=8.5,
                color=INK, zorder=4)

ax.set_yticks(range(len(models)))
ax.set_yticklabels([m.replace("mobilenet-", "mobilenet-\n") for m in models],
                   fontsize=9, color=INK)
ax.invert_yaxis()
ax.set_xlabel("frames / second, one TPU v5e chip (best batch & impl)",
              fontsize=9.5, color=MUTED)
ax.set_xlim(0, max(r["fps"] for r in best.values()) * 1.32)
ax.xaxis.grid(True, color=GRID, linewidth=0.8, zorder=0)
ax.set_axisbelow(True)
for s in ("top", "right", "left"):
    ax.spines[s].set_visible(False)
ax.spines["bottom"].set_color(GRID)
ax.tick_params(colors=MUTED, labelsize=8.5)
ax.legend(frameon=False, fontsize=9, loc="lower right")
ax.set_title("FastDepth-TPU throughput frontier — 224x224 NYUv2 inference",
             fontsize=11, color=INK, loc="left", pad=12)
fig.tight_layout()
out = os.path.join(repo, "docs", "frontier.png")
fig.savefig(out)
print("wrote", out)
