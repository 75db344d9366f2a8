"""Axis-aligned anchor↔gt target assignment — fully vectorized jnp.

Parity: reference target_assigner/axis_aligned_target_assigner.py
(assign_targets_single, :135-210). The reference loops per batch and
per anchor-class; here the whole (A, M) assignment runs as one masked
computation under vmap:

- IoU between anchors and gts of a *different* class is forced to -1,
  which collapses the per-class loop (each anchor only ever sees its
  own class's gts, each gt's best-anchor search only ranges over its
  class's anchors).
- force-matching (each gt claims its best-overlap anchors) uses the
  per-gt column max with empty gts (max == 0) excluded.
- labels: gt class id for fg (forced ∪ above-matched-threshold), 0 for
  below-unmatched-threshold, -1 in between; all 0 if the sample has no
  valid gts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops import iou3d


def _iou_matrix(anchors, gt_boxes, match_height: bool, chunk: int = 8192):
    if not match_height:
        return iou3d.boxes3d_nearest_bev_iou(anchors, gt_boxes)
    # rotated 3D IoU, chunked over the (large) anchor dim
    a = anchors.shape[0]
    pad = (-a) % chunk
    padded = jnp.pad(anchors, ((0, pad), (0, 0)))
    rows = padded.reshape(-1, chunk, anchors.shape[1])
    out = jax.lax.map(lambda r: iou3d.boxes_iou3d(r, gt_boxes), rows)
    return out.reshape(-1, gt_boxes.shape[0])[:a]


@functools.partial(jax.jit, static_argnames=("box_coder", "match_height"))
def assign_targets(
    anchors,          # (A, 7)
    anchor_group,     # (A,) int32 — class-group per anchor
    matched_thr,      # (A,) float32
    unmatched_thr,    # (A,) float32
    gt_boxes,         # (B, M, 7+1[+2]) last col = class id, zero padded
    box_coder=None,
    match_height: bool = False,
):
    """Returns dict with box_cls_labels (B, A) int32,
    box_reg_targets (B, A, code_size), reg_weights (B, A)."""

    def single(gt):
        ndim = gt.shape[-1] - 1
        gt_box = gt[:, :ndim]
        gt_cls = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(gt[:, :7]) > 0, axis=-1)

        iou = _iou_matrix(anchors[:, :7], gt_box[:, :7], match_height)
        class_ok = (gt_cls[None, :] == anchor_group[:, None] + 1) & gt_valid[None, :]
        iou_eff = jnp.where(class_ok, iou, -1.0)

        anchor_max = jnp.max(iou_eff, axis=1)
        anchor_arg = jnp.argmax(iou_eff, axis=1)
        gt_max = jnp.max(iou_eff, axis=0)  # (M,)
        gt_max_eff = jnp.where(gt_max > 0, gt_max, -2.0)
        forced = jnp.any(
            (iou_eff == gt_max_eff[None, :]) & (iou_eff > 0), axis=1
        )

        pos = anchor_max >= matched_thr
        fg = pos | forced
        label = jnp.where(
            fg,
            gt_cls[anchor_arg],
            jnp.where(anchor_max < unmatched_thr, 0, -1),
        )
        label = jnp.where(jnp.any(gt_valid), label, 0).astype(jnp.int32)

        matched_gt = gt_box[anchor_arg]  # (A, ndim)
        anchors_full = anchors
        if ndim > anchors.shape[-1]:  # 9-DoF gts vs 7-dim anchors:
            # pad anchor pitch/roll with zeros (reference
            # AnchorHeadTemplate.generate_anchors pads to code size)
            anchors_full = jnp.pad(
                anchors, ((0, 0), (0, ndim - anchors.shape[-1]))
            )
        target = box_coder.encode(matched_gt, anchors_full)
        reg_targets = jnp.where(fg[:, None], target, 0.0)
        reg_weights = fg.astype(jnp.float32)
        return label, reg_targets, reg_weights

    labels, reg_targets, reg_weights = jax.vmap(single)(gt_boxes)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": reg_targets,
        "reg_weights": reg_weights,
    }
