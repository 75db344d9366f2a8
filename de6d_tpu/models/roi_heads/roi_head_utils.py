"""Shared RoI-stage machinery (pure functions, fixed shapes).

Parity: reference roi_heads/roi_head_template.py (:261) +
target_assigner/proposal_target_layer.py (:228):
- proposal layer: per-sample NMS over first-stage boxes → fixed
  (B, num_rois) proposals,
- proposal target assignment: per-roi max-IoU gt matching, fg/bg
  sampling with static counts, iou-interpolated cls labels
  (roi_iou score type), canonical-frame regression targets,
- losses: BCE cls + smooth-L1 on local residuals + corner loss.

TPU deviations: the random fg/bg subsampling uses Gumbel-noised top-k
(stateless PRNG) instead of torch.randperm; all roi buffers are
fixed-size with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import geometry, iou3d, nms as nms_ops
from ...utils import box_coder_utils, loss_utils


def proposal_layer(batch_dict, nms_cfg, num_rois: int):
    """First-stage boxes → (B, num_rois) proposals via NMS
    (reference RoIHeadTemplate.proposal_layer)."""
    # proposals are constants w.r.t. the second stage (reference
    # decorates proposal_layer with torch.no_grad, roi_head_template.py)
    cls_preds = jax.lax.stop_gradient(batch_dict["batch_cls_preds"])
    box_preds = jax.lax.stop_gradient(batch_dict["batch_box_preds"])
    normalized = batch_dict.get("cls_preds_normalized", False)
    scores_all = cls_preds if normalized else jax.nn.sigmoid(cls_preds)

    def single(scores_nc, boxes):
        scores = jnp.max(scores_nc, axis=-1)
        labels = jnp.argmax(scores_nc, axis=-1) + 1
        idx, count = nms_ops.nms(
            boxes, scores,
            thresh=float(nms_cfg["NMS_THRESH"]),
            pre_maxsize=int(nms_cfg["NMS_PRE_MAXSIZE"]),
            post_maxsize=num_rois,
        )
        in_cnt = jnp.arange(num_rois) < count
        rois = jnp.where(in_cnt[:, None], boxes[idx], 0.0)
        roi_scores = jnp.where(in_cnt, scores[idx], 0.0)
        roi_labels = jnp.where(in_cnt, labels[idx], 0)
        return rois, roi_scores, roi_labels.astype(jnp.int32), in_cnt

    rois, roi_scores, roi_labels, roi_valid = jax.vmap(single)(
        scores_all, box_preds
    )
    batch_dict["rois"] = rois
    batch_dict["roi_scores"] = roi_scores
    batch_dict["roi_labels"] = roi_labels
    batch_dict["roi_valid"] = roi_valid
    return batch_dict


def assign_roi_targets(rois, roi_valid, roi_labels, gt_boxes, rng,
                       roi_per_image: int, fg_ratio: float = 0.5,
                       fg_thresh: float = 0.55,
                       bg_thresh: float = 0.1,
                       cls_fg: float = 0.75, cls_bg: float = 0.25):
    """Sample roi_per_image rois per sample with ~fg_ratio foreground
    (reference proposal_target_layer). Returns dict of (B, R, ...)."""

    def single(rois_b, valid_b, labels_b, gt_b, key):
        boxes = gt_b[:, :-1]
        gt_cls = gt_b[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        iou = iou3d.boxes_iou3d(rois_b[:, :7], boxes[:, :7])
        # class-aware matching (reference matches within same class)
        same_cls = labels_b[:, None] == gt_cls[None, :]
        iou = jnp.where(same_cls & gt_valid[None, :], iou, -1.0)
        max_iou = jnp.max(iou, axis=-1)
        gt_arg = jnp.argmax(iou, axis=-1)
        max_iou = jnp.where(valid_b, max_iou, -1.0)

        fg = max_iou >= fg_thresh
        bg = (max_iou < fg_thresh) & valid_b
        n_fg = int(roi_per_image * fg_ratio)
        g1, g2 = jax.random.split(key)
        fg_key = jnp.where(fg, max_iou + jax.random.uniform(g1, fg.shape), -1e9)
        bg_key = jnp.where(bg, jax.random.uniform(g2, bg.shape), -1e9)
        _, fg_idx = jax.lax.top_k(fg_key, n_fg)
        _, bg_idx = jax.lax.top_k(bg_key, roi_per_image - n_fg)
        sel = jnp.concatenate([fg_idx, bg_idx])
        sel_valid = jnp.concatenate(
            [fg[fg_idx], bg[bg_idx]]
        )

        s_rois = rois_b[sel]
        s_iou = jnp.where(sel_valid, max_iou[sel], 0.0)
        s_gt = boxes[gt_arg[sel]]
        s_labels = labels_b[sel]
        # iou-interpolated cls target (roi_iou score type)
        cls_t = jnp.clip((s_iou - cls_bg) / (cls_fg - cls_bg), 0.0, 1.0)
        reg_valid = (s_iou > fg_thresh) & sel_valid
        return (
            s_rois, s_gt, cls_t, reg_valid, s_labels, sel_valid,
        )

    b = rois.shape[0]
    keys = jax.random.split(rng, b)
    (s_rois, s_gt, cls_t, reg_valid, s_labels, sel_valid) = jax.vmap(single)(
        rois, roi_valid, roi_labels, gt_boxes, keys
    )
    return {
        "rois": s_rois,
        "gt_of_rois": s_gt,
        "rcnn_cls_labels": cls_t,
        "reg_valid_mask": reg_valid,
        "roi_labels": s_labels,
        "roi_sample_valid": sel_valid,
    }


def canonical_transform_targets(rois, gt_of_rois):
    """GT boxes in each roi's canonical frame (reference
    roi_head_template.get_box_reg_layer_loss residual encoding):
    translate to roi center, rotate by -roi_yaw; encode with
    ResidualCoder against a centered roi anchor."""
    roi_ry = rois[..., 6]
    roi_xyz = rois[..., 0:3]
    local = gt_of_rois.at[..., 0:3].add(-roi_xyz)
    b, r = rois.shape[:2]
    local_xyz = geometry.rotate_points_along_z(
        local[..., 0:3].reshape(b * r, 1, 3), -roi_ry.reshape(-1)
    ).reshape(b, r, 3)
    local = local.at[..., 0:3].set(local_xyz)
    local = local.at[..., 6].add(-roi_ry)
    return local


def rcnn_box_decode(rois, rcnn_reg, code_size: int = 7):
    """Decode local residuals back to world boxes."""
    coder = box_coder_utils.ResidualCoder(code_size=code_size)
    b, r = rois.shape[:2]
    local_anchor = jnp.zeros_like(rois[..., :7])
    local_anchor = local_anchor.at[..., 3:6].set(rois[..., 3:6])
    boxes_local = coder.decode(
        rcnn_reg.reshape(b * r, -1), local_anchor.reshape(b * r, 7)
    )
    xyz = geometry.rotate_points_along_z(
        boxes_local[:, None, 0:3], rois[..., 6].reshape(-1)
    ).squeeze(1) + rois[..., 0:3].reshape(-1, 3)
    boxes = boxes_local.at[:, 0:3].set(xyz)
    boxes = boxes.at[:, 6].add(rois[..., 6].reshape(-1))
    return boxes.reshape(b, r, -1)


def roi_head_loss(ret_dict, loss_cfg):
    """BCE cls + smooth-L1 local reg + corner loss (reference
    get_box_cls_layer_loss/get_box_reg_layer_loss)."""
    w = loss_cfg["LOSS_WEIGHTS"]
    rcnn_cls = ret_dict["rcnn_cls"].reshape(-1)
    cls_labels = ret_dict["rcnn_cls_labels"].reshape(-1)
    sample_valid = ret_dict["roi_sample_valid"].reshape(-1)
    cls_valid = sample_valid.astype(jnp.float32)
    bce = loss_utils.sigmoid_bce_with_logits(rcnn_cls, cls_labels)
    cls_loss = (bce * cls_valid).sum() / jnp.clip(cls_valid.sum(), 1.0, None)
    cls_loss = cls_loss * float(w["rcnn_cls_weight"])

    reg_valid = ret_dict["reg_valid_mask"].reshape(-1).astype(jnp.float32)
    rois = ret_dict["rois"].reshape(-1, ret_dict["rois"].shape[-1])
    gt_local = ret_dict["gt_of_rois_local"].reshape(
        -1, ret_dict["gt_of_rois_local"].shape[-1]
    )
    coder = box_coder_utils.ResidualCoder()
    local_anchor = jnp.zeros_like(rois[:, :7])
    local_anchor = local_anchor.at[:, 3:6].set(rois[:, 3:6])
    reg_targets = coder.encode(gt_local[:, :7], local_anchor)
    rcnn_reg = ret_dict["rcnn_reg"].reshape(-1, reg_targets.shape[-1])
    norm = jnp.clip(reg_valid.sum(), 1.0, None)
    reg_loss = (
        loss_utils.smooth_l1_loss(
            rcnn_reg, reg_targets, weights=reg_valid,
            code_weights=w.get("code_weights"),
        ).sum()
        / norm
        * float(w["rcnn_reg_weight"])
    )

    total = cls_loss + reg_loss
    tb = {"rcnn_loss_cls": cls_loss, "rcnn_loss_reg": reg_loss}

    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        decoded = rcnn_box_decode(
            ret_dict["rois"], ret_dict["rcnn_reg"]
        ).reshape(-1, 7)
        gt_world = ret_dict["gt_of_rois"].reshape(
            -1, ret_dict["gt_of_rois"].shape[-1]
        )
        corner = loss_utils.get_corner_loss_lidar(
            decoded, gt_world[:, :7]
        )
        corner_loss = (
            (corner * reg_valid).sum() / norm * float(w["rcnn_corner_weight"])
        )
        total = total + corner_loss
        tb["rcnn_loss_corner"] = corner_loss
    tb["rcnn_loss"] = total
    return total, tb
