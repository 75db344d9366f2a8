"""Per-dataset slope/angle statistics.

Parity: reference tools/experiments/dataset_statistic.py (:236) —
histograms of gt pitch/roll/yaw and per-frame slope params over a
(Sloped)KITTI infos file.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--infos", required=True)
    ap.add_argument("--out", default="dataset_statistic.png")
    args = ap.parse_args()

    with open(args.infos, "rb") as f:
        infos = pickle.load(f)

    yaws, pitches, rolls, counts = [], [], [], []
    for info in infos:
        annos = info.get("annos")
        if annos is None:
            continue
        gt = annos["gt_boxes_lidar"]
        counts.append(gt.shape[0])
        if gt.shape[0] == 0:
            continue
        yaws.append(gt[:, 6])
        if gt.shape[1] >= 9:
            pitches.append(gt[:, 7])
            rolls.append(gt[:, 8])

    yaws = np.concatenate(yaws) if yaws else np.zeros(0)
    pitches = np.concatenate(pitches) if pitches else np.zeros(0)
    rolls = np.concatenate(rolls) if rolls else np.zeros(0)

    print(f"frames: {len(infos)}  gts: {int(np.sum(counts))}")
    for name, arr in (("yaw", yaws), ("pitch", pitches), ("roll", rolls)):
        if len(arr):
            print(
                f"{name}: mean {np.mean(arr):+.4f} std {np.std(arr):.4f} "
                f"|>0.5deg|: {np.mean(np.abs(arr) > np.deg2rad(0.5)):.3f}"
            )

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    for ax, (name, arr) in zip(
        axes, (("yaw", yaws), ("pitch", pitches), ("roll", rolls))
    ):
        if len(arr):
            ax.hist(np.rad2deg(arr), bins=90)
        ax.set_title(f"gt {name} (deg)")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
