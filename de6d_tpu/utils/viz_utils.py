"""Visualization helpers (matplotlib, headless).

Replaces the reference's open3d/mayavi viz stack
(core/tools/visual_utils/open3d_vis_utils.py — incl. the 9-DoF
box→lineset path at :199-260) with matplotlib renders usable in this
image (no GL): BEV scatter + box polygons, and a 3-panel (BEV/side/
front) view for full-pose boxes.
"""

from __future__ import annotations

import numpy as np

from . import box_np_ops


def _bev_corners(boxes):
    if boxes.shape[1] >= 9:
        c3d = box_np_ops.boxes9d_to_corners_3d(boxes)
    else:
        c3d = box_np_ops.boxes_to_corners_3d(boxes)
    return c3d[:, :4, :2], c3d  # bottom ring


def save_bev_png(points, boxes, out_path, scores=None, gt_boxes=None,
                 xlim=(0, 70), ylim=(-40, 40)):
    """points (N, 3+), boxes (M, 7|9+) → BEV png."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=0.2, c="#888888", linewidths=0)

    def draw(bxs, color):
        if bxs is None or len(bxs) == 0:
            return
        rings, _ = _bev_corners(np.asarray(bxs))
        for ring in rings:
            poly = np.concatenate([ring, ring[:1]], axis=0)
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.2)

    draw(gt_boxes, "#2ca02c")
    draw(boxes, "#d62728")
    if scores is not None and len(boxes):
        for b, s in zip(np.asarray(boxes), np.asarray(scores)):
            ax.text(b[0], b[1], f"{s:.2f}", fontsize=6, color="#d62728")
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    ax.set_title(f"{len(boxes)} detections")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def save_three_view_png(points, boxes, out_path, gt_boxes=None):
    """BEV + side (x-z) + front (y-z) panels — pitch/roll visible."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    fig, axes = plt.subplots(1, 3, figsize=(24, 8))
    planes = [(0, 1, "BEV (x-y)"), (0, 2, "side (x-z)"), (1, 2, "front (y-z)")]
    boxes = np.asarray(boxes) if boxes is not None else np.zeros((0, 9))
    _, corners = _bev_corners(boxes) if len(boxes) else (None, np.zeros((0, 8, 3)))
    gt_corners = None
    if gt_boxes is not None and len(gt_boxes):
        _, gt_corners = _bev_corners(np.asarray(gt_boxes))

    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    for ax, (i, j, title) in zip(axes, planes):
        ax.scatter(pts[:, i], pts[:, j], s=0.2, c="#888888", linewidths=0)
        for cset, color in ((gt_corners, "#2ca02c"), (corners, "#d62728")):
            if cset is None:
                continue
            for c in cset:
                for a, b in edges:
                    ax.plot(
                        [c[a, i], c[b, i]], [c[a, j], c[b, j]],
                        color=color, linewidth=0.8,
                    )
        ax.set_title(title)
        ax.set_aspect("equal")
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
