"""ATSS target assignment (arXiv:1912.02424) — fully vectorized jnp.

Parity: reference target_assigner/atss_target_assigner.py:141. For
each gt: take the topk closest anchors by center distance, threshold
their IoUs at mean+std, require the anchor center inside the gt's BEV
rectangle, then resolve each anchor to its best-IoU positive gt; every
gt additionally force-claims its globally best-IoU anchor.

The reference loops per batch sample with dynamic gt counts; here the
whole thing is masked fixed-shape math under vmap (padded gt rows are
all-zero → invalid).

The in-box check compares (x_local, y_local) against (dy, dx)/2 — the
reference's '[1, 0]' dim swap (atss_target_assigner.py:112) — kept
verbatim for behavioral parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops import iou3d

INF = 3.4e38  # plain float: module-level jnp arrays init the backend


def _rotate_z(points, angle):
    """(..., 3) points rotated by angle around z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c - points[..., 1] * s
    y = points[..., 0] * s + points[..., 1] * c
    return jnp.stack([x, y, points[..., 2]], axis=-1)


def _iou_matrix(anchors, gt_boxes, match_height: bool, chunk: int = 8192):
    a = anchors.shape[0]
    pad = (-a) % chunk
    padded = jnp.pad(anchors, ((0, pad), (0, 0)))
    rows = padded.reshape(-1, chunk, anchors.shape[1])
    fn = iou3d.boxes_iou3d if match_height else iou3d.boxes_iou_bev
    out = jax.lax.map(lambda r: fn(r, gt_boxes), rows)
    return out.reshape(-1, gt_boxes.shape[0])[:a]


@functools.partial(
    jax.jit, static_argnames=("topk", "box_coder", "match_height")
)
def assign_targets_atss(
    anchors,        # (A, 7)
    gt_boxes,       # (B, M, 7+1) last col class id, zero padded
    topk: int = 9,
    box_coder=None,
    match_height: bool = False,
):
    """Returns dict(box_cls_labels (B, A) int32, box_reg_targets
    (B, A, code), reg_weights (B, A))."""
    num_anchor = anchors.shape[0]

    def single(gt):
        ndim = gt.shape[-1] - 1
        gt_box = gt[:, :ndim]
        gt_cls = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(gt[:, :7]) > 0, axis=-1)
        m = gt_box.shape[0]
        k = min(topk, num_anchor)

        ious = _iou_matrix(
            anchors[:, :7], gt_box[:, :7], match_height
        )  # (A, M)
        # the Green's-pass overlap cancels ~coordinate^2-sized
        # contributions, leaving up to ~1e-5 noise for disjoint boxes
        # (the reference's polygon clipping returns exact 0); ATSS
        # thresholds at mean+std+1e-6 so that noise would create
        # spurious positives on gts with no overlapping anchor — floor
        # it away (1e-4 is far below any meaningful assignment IoU)
        ious = jnp.where(ious > 1e-4, ious, 0.0)
        dist = jnp.linalg.norm(
            anchors[:, None, 0:3] - gt_box[None, :, 0:3], axis=-1
        )
        dist = jnp.where(gt_valid[None, :], dist, INF)
        _, topk_idx = jax.lax.top_k(-dist.T, k)  # (M, K) anchor ids

        cand_ious = jnp.take_along_axis(
            ious.T, topk_idx, axis=1
        )  # (M, K)
        mean = jnp.mean(cand_ious, axis=1)
        # torch.std default: unbiased (ddof=1)
        std = jnp.std(cand_ious, axis=1, ddof=1)
        thresh = mean + std + 1e-6
        is_pos = cand_ious >= thresh[:, None]  # (M, K)

        # anchor-center-in-gt BEV test (reference dim swap kept)
        cand = anchors[topk_idx]  # (M, K, 7)
        local = _rotate_z(
            cand[..., 0:3] - gt_box[:, None, 0:3],
            -gt_box[:, None, 6],
        )
        lw = gt_box[:, None, 3:5][..., ::-1]  # (M, 1, 2) = (dy, dx)
        in_gt = jnp.all(
            (local[..., 0:2] <= lw / 2) & (local[..., 0:2] >= -lw / 2),
            axis=-1,
        )
        is_pos = is_pos & in_gt & gt_valid[:, None]

        # scatter candidate positivity into the dense (A, M) pair grid
        pos_pair = jnp.zeros((num_anchor, m), bool)
        pos_pair = pos_pair.at[
            topk_idx, jnp.arange(m)[:, None]
        ].max(is_pos)

        ious_eff = jnp.where(
            pos_pair & gt_valid[None, :], ious, -INF
        )
        a2g_val = jnp.max(ious_eff, axis=1)
        a2g_idx = jnp.argmax(ious_eff, axis=1)

        # every valid gt force-claims its best-IoU anchor
        ious_v = jnp.where(gt_valid[None, :], ious, -INF)
        best_anchor = jnp.argmax(ious_v, axis=0)  # (M,)
        best_val = jnp.max(ious_v, axis=0)
        safe_anchor = jnp.where(gt_valid, best_anchor, num_anchor)
        a2g_idx = a2g_idx.at[safe_anchor].set(
            jnp.arange(m), mode="drop"
        )
        a2g_val = a2g_val.at[safe_anchor].set(best_val, mode="drop")

        fg = a2g_val > -INF / 2
        labels = jnp.where(fg, gt_cls[a2g_idx], 0).astype(jnp.int32)
        matched = gt_box[a2g_idx]
        anchors_full = anchors
        if ndim > anchors.shape[-1]:
            anchors_full = jnp.pad(
                anchors, ((0, 0), (0, ndim - anchors.shape[-1]))
            )
        # truncate to the coder's width (9-DoF gts append pitch/roll
        # after the yaw code; 7-DoF heads predict code_size channels)
        target = box_coder.encode(matched, anchors_full)[
            ..., : box_coder.code_size
        ]
        reg_targets = jnp.where(fg[:, None], target, 0.0)
        reg_weights = fg.astype(jnp.float32)
        return labels, reg_targets, reg_weights

    labels, reg_targets, reg_weights = jax.vmap(single)(gt_boxes)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": reg_targets,
        "reg_weights": reg_weights,
    }
