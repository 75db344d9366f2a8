"""Visualization helpers (matplotlib, headless).

Replaces the reference's open3d/mayavi viz stack
(core/tools/visual_utils/open3d_vis_utils.py — incl. the 9-DoF
box→lineset path at :199-260) with matplotlib renders usable in this
image (no GL): BEV scatter + box polygons, and a 3-panel (BEV/side/
front) view for full-pose boxes.
"""

from __future__ import annotations

import numpy as np
from pathlib import Path

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


_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
    # heading cross on the +x (front) face — reference adds [[1,4],[7,6]]
    # to the open3d lineset (open3d_vis_utils.py:222-225)
    (0, 5), (1, 4),
]


def _corners_any(boxes):
    boxes = np.asarray(boxes)
    if boxes.shape[1] >= 9:
        return box_np_ops.boxes9d_to_corners_3d(boxes)
    return box_np_ops.boxes_to_corners_3d(boxes)


def save_wireframe_3d_png(points, boxes, out_path, gt_boxes=None,
                          scores=None, elev=28, azim=-65, point_size=0.3,
                          max_points=60000):
    """Lineset-quality 3-D render, headless matplotlib.

    Full 12-edge wireframes + heading cross per box (7 or 9-DoF), the
    matplotlib equivalent of the reference's open3d 9-DoF lineset path
    (open3d_vis_utils.py:199-260)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    if len(pts) > max_points:
        pts = pts[:: len(pts) // max_points + 1]
    fig = plt.figure(figsize=(14, 10))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=point_size,
               c=pts[:, 2], cmap="viridis", linewidths=0, alpha=0.6)

    def draw(bxs, color):
        if bxs is None or len(bxs) == 0:
            return
        for c in _corners_any(np.asarray(bxs)):
            for a, b in _EDGES:
                ax.plot([c[a, 0], c[b, 0]], [c[a, 1], c[b, 1]],
                        [c[a, 2], c[b, 2]], color=color, linewidth=1.0)

    draw(gt_boxes, "#2ca02c")
    draw(boxes, "#d62728")
    if scores is not None and boxes is not None and len(boxes):
        for b, s in zip(np.asarray(boxes), np.asarray(scores)):
            ax.text(b[0], b[1], b[2] + b[5], f"{s:.2f}",
                    fontsize=7, color="#d62728")
    ax.view_init(elev=elev, azim=azim)
    span = pts[:, :3].max(0) - pts[:, :3].min(0) + 1e-6
    ax.set_box_aspect(tuple(span / span.max()))
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def save_turntable_gif(points, boxes, out_path, gt_boxes=None,
                       scores=None, n_frames=24, elev=28, fps=8,
                       point_size=0.3, max_points=30000):
    """Animated turntable of the 3-D wireframe scene — the headless
    equivalent of the reference's interactive open3d spin + gif
    recording (experiments/viz/open3d_vis_utils.py rotating-view
    capture path): renders ``n_frames`` azimuth steps of the same
    lineset scene and folds them into one GIF via PIL (same encoder
    as small_utils image2gif)."""
    import io

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    pts = np.asarray(points)
    if len(pts) > max_points:
        pts = pts[:: len(pts) // max_points + 1]
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=point_size,
               c=pts[:, 2], cmap="viridis", linewidths=0, alpha=0.6)

    def draw(bxs, color):
        if bxs is None or len(bxs) == 0:
            return
        for c in _corners_any(np.asarray(bxs)):
            for a, b in _EDGES:
                ax.plot([c[a, 0], c[b, 0]], [c[a, 1], c[b, 1]],
                        [c[a, 2], c[b, 2]], color=color, linewidth=1.0)

    draw(gt_boxes, "#2ca02c")
    draw(boxes, "#d62728")
    if scores is not None and boxes is not None and len(boxes):
        for b, s in zip(np.asarray(boxes), np.asarray(scores)):
            ax.text(b[0], b[1], b[2] + b[5], f"{s:.2f}",
                    fontsize=7, color="#d62728")
    span = pts[:, :3].max(0) - pts[:, :3].min(0) + 1e-6
    ax.set_box_aspect(tuple(span / span.max()))

    frames = []
    for i in range(n_frames):
        ax.view_init(elev=elev, azim=-180 + 360.0 * i / n_frames)
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=80)
        buf.seek(0)
        frames.append(Image.open(buf).convert("P"))
    plt.close(fig)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(
        out_path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )
    return out_path


def save_sampling_png(points, coords_list, out_path, valid_list=None,
                      layer_names=None):
    """Backbone sampling diagnostic (reference
    experiments/viz/backbone_sampling.py): raw cloud in gray, each SA
    layer's kept points in a distinct color/size, BEV + side panels."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd"]
    fig, axes = plt.subplots(1, 2, figsize=(22, 9))
    for ax, (i, j, title) in zip(
        axes, [(0, 1, "BEV (x-y)"), (0, 2, "side (x-z)")]
    ):
        ax.scatter(pts[:, i], pts[:, j], s=0.2, c="#cccccc", linewidths=0)
        for li, coords in enumerate(coords_list):
            c = np.asarray(coords)
            if valid_list is not None:
                c = c[np.asarray(valid_list[li]).astype(bool)]
            name = (
                layer_names[li] if layer_names else f"SA{li + 1}"
            ) + f" ({len(c)})"
            ax.scatter(c[:, i], c[:, j], s=2.0 + 2.5 * li,
                       c=colors[li % len(colors)], linewidths=0, label=name)
        ax.set_title(title)
        ax.set_aspect("equal")
        ax.legend(markerscale=4, loc="upper right")
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def save_seg_and_head_png(points, seg_coords, seg_scores, out_path,
                          cand_coords=None, vote_coords=None, boxes=None,
                          gt_boxes=None):
    """Segmentation + head diagnostic (reference
    experiments/viz/seg_and_head.py): per-point foreground score
    colormap, candidate→vote offset arrows, decoded boxes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    sc = np.asarray(seg_coords)
    ss = np.asarray(seg_scores).reshape(-1)
    fig, axes = plt.subplots(1, 2, figsize=(22, 9))
    for ax, (i, j, title) in zip(
        axes, [(0, 1, "seg scores (BEV)"), (0, 2, "seg scores (side)")]
    ):
        ax.scatter(pts[:, i], pts[:, j], s=0.15, c="#dddddd", linewidths=0)
        m = ax.scatter(sc[:, i], sc[:, j], s=4, c=ss, cmap="inferno",
                       vmin=0, vmax=1, linewidths=0)
        if cand_coords is not None and vote_coords is not None:
            cc, vc = np.asarray(cand_coords), np.asarray(vote_coords)
            for k in range(len(cc)):
                ax.plot([cc[k, i], vc[k, i]], [cc[k, j], vc[k, j]],
                        color="#1f77b4", linewidth=0.4, alpha=0.6)
        for bxs, color in ((gt_boxes, "#2ca02c"), (boxes, "#d62728")):
            if bxs is None or len(bxs) == 0:
                continue
            for c in _corners_any(np.asarray(bxs)):
                for a, b in _EDGES:
                    ax.plot([c[a, i], c[b, i]], [c[a, j], c[b, j]],
                            color=color, linewidth=0.9)
        ax.set_title(title)
        ax.set_aspect("equal")
    fig.colorbar(m, ax=axes, shrink=0.7, label="foreground score")
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
