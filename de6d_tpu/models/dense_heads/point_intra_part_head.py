"""Point-intra-part head (Part-A2 stage 1).

Parity: reference dense_heads/point_intra_part_offset_head.py (:127):
per-voxel-point foreground segmentation + intra-object part location
regression (the canonical [0,1]³ position of each point inside its
box), trained on the UNet's full-resolution voxel features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import geometry, sparse
from ...registry import POINT_HEADS
from ...utils import loss_utils
from ..model_utils.mlp import FCStack


def part_targets(points, valid, gt_boxes):
    """fg mask + canonical part location in [0,1]³ per point."""

    def single(pts, v, gt):
        boxes = gt[:, :-1]
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        use = boxes[:, :9] if boxes.shape[-1] >= 9 else boxes[:, :7]
        idx = geometry.points_in_boxes_index(pts, use, gt_valid)
        fg = (idx >= 0) & v
        safe = jnp.clip(idx, 0, None)
        box = boxes[safe]
        local = pts - box[:, 0:3]
        rot = geometry.boxes_to_rotation_matrix(use[safe])
        local = jnp.einsum("nji,nj->ni", rot, local)
        part = local / jnp.clip(box[:, 3:6], 1e-5, None) + 0.5
        part = jnp.clip(part, 0.0, 1.0)
        cls_label = jnp.where(v, fg.astype(jnp.int32), -1)
        return cls_label, jnp.where(fg[:, None], part, 0.0)

    return jax.vmap(single)(points, valid, gt_boxes)


@POINT_HEADS.register
class PointIntraPartOffsetHead(nn.Module):
    model_cfg: dict
    num_class: int
    predict_boxes_when_training: bool = False

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["point_features_unet"]  # (B, V, C)
        keys = batch_dict["point_keys_unet"]
        grid = batch_dict["point_grid_unet"]
        spec_vs = batch_dict["voxel_size_xyz"]
        pc0 = batch_dict["pc_range_min"]

        def centers(k):
            c = sparse.keys_to_coords(k, grid)
            return jnp.stack(
                [
                    (c[:, 2] + 0.5) * spec_vs[0] + pc0[0],
                    (c[:, 1] + 0.5) * spec_vs[1] + pc0[1],
                    (c[:, 0] + 0.5) * spec_vs[2] + pc0[2],
                ],
                axis=-1,
            )

        coords = jax.vmap(centers)(keys)
        valid = keys != sparse.INVALID

        use_bn = self.model_cfg.get("USE_BN", True)
        seg_pred = FCStack(
            tuple(self.model_cfg.get("CLS_FC", [128])), self.num_class,
            use_bn=use_bn,
        )(feats, train)
        part_pred = FCStack(
            tuple(self.model_cfg.get("PART_FC", [128])), 3, use_bn=use_bn
        )(feats, train)

        batch_dict["point_cls_preds"] = seg_pred
        batch_dict["point_part_preds"] = part_pred
        batch_dict["point_part_coords"] = coords
        batch_dict["point_part_valid"] = valid
        if train:
            cls_l, part_l = part_targets(
                coords, valid, jax.lax.stop_gradient(batch_dict["gt_boxes"])
            )
            batch_dict["point_part_cls_labels"] = cls_l
            batch_dict["point_part_labels"] = part_l
        return batch_dict


def part_head_loss(batch_dict, loss_cfg):
    w = loss_cfg["LOSS_WEIGHTS"]
    cls_labels = batch_dict["point_part_cls_labels"].reshape(-1)
    seg_pred = batch_dict["point_cls_preds"].reshape(
        -1, batch_dict["point_cls_preds"].shape[-1]
    )
    positives = cls_labels > 0
    negatives = cls_labels == 0
    weights = (positives | negatives).astype(jnp.float32)
    norm = jnp.clip(jnp.sum(positives.astype(jnp.float32)), 1.0, None)
    one_hot = jnp.clip(cls_labels, 0, 1).astype(jnp.float32)[:, None]
    seg_loss = loss_utils.sigmoid_focal_loss(
        seg_pred, one_hot, weights=weights / norm
    ).sum() * float(w.get("point_cls_weight", 1.0))

    part_pred = batch_dict["point_part_preds"].reshape(-1, 3)
    part_labels = batch_dict["point_part_labels"].reshape(-1, 3)
    pw = positives.astype(jnp.float32) / norm
    part_loss = (
        loss_utils.weighted_binary_cross_entropy(
            part_pred, part_labels, weights=pw
        ).sum()
        * float(w.get("point_part_weight", 1.0))
    )
    return seg_loss + part_loss, {
        "part_loss_seg": seg_loss, "part_loss_reg": part_loss,
    }
