"""KITTI→SlopedKITTI degradation table/plot.

Parity: reference tools/experiments/ap_comparison.py (:63) — the
reference hardcodes its published arrays (:15-18); here the same
published numbers are kept as the baseline reference and optionally
merged with a sweep_results.json from eval_all.py.
"""

from __future__ import annotations

import argparse
import json

# Published reference numbers (BASELINE.md / docs/img/slopedkitti.png)
MODELS = [
    "SECOND", "PointPillars", "Part-A2", "PV-RCNN", "CenterPoint",
    "Voxel R-CNN", "PointRCNN", "3DSSD", "3DSSD-SASA", "IA-SSD", "Det6D",
]
KITTI_AP_MOD = [76.48, 77.98, 79.47, 83.69, 79.48, 84.52, 78.63, 79.45,
                84.80, 79.57, 84.41]
SKITTI_AP_MOD = [37.23, 34.10, 36.92, 37.25, 36.50, 37.50, 39.11, 37.01,
                 37.28, 39.55, 73.55]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default=None,
                    help="optional sweep_results.json to overlay")
    ap.add_argument("--out", default="ap_comparison.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows = list(zip(MODELS, KITTI_AP_MOD, SKITTI_AP_MOD))
    if args.sweep:
        with open(args.sweep) as f:
            sweep = json.load(f)
        for tag, metrics in sweep.items():
            ap3d = metrics.get("Car_3d/moderate_R40")
            if ap3d is not None:
                rows.append((f"[ours] {tag}", float("nan"), ap3d))

    print(f"{'model':24s} {'KITTI':>8s} {'Sloped':>8s} {'drop':>8s}")
    for name, k, s in rows:
        drop = k - s if k == k else float("nan")
        print(f"{name:24s} {k:8.2f} {s:8.2f} {drop:8.2f}")

    fig, ax = plt.subplots(figsize=(12, 6))
    x = np.arange(len(rows))
    ax.bar(x - 0.2, [r[1] for r in rows], width=0.4, label="KITTI")
    ax.bar(x + 0.2, [r[2] for r in rows], width=0.4, label="SlopedKITTI")
    ax.set_xticks(x)
    ax.set_xticklabels([r[0] for r in rows], rotation=45, ha="right")
    ax.set_ylabel("Car 3D AP (Moderate)")
    ax.legend()
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
