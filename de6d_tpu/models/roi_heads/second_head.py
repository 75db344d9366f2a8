"""SECOND-IoU BEV RoI head.

Parity: reference roi_heads/second_head.py (:188): per-proposal
rotated RoI-grid sampling of the 2D BEV features (bilinear), FC stack
→ predicted IoU; trained with smooth-L1 against (2·iou − 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import geometry, iou3d
from ...registry import ROI_HEADS
from ...utils import loss_utils
from ..backbones_3d.pfe.voxel_set_abstraction import (
    bilinear_interpolate_bev,
)
from ..model_utils.mlp import FCStack
from . import roi_head_utils


def bev_roi_grid_pool(bev, rois, pc_range, voxel_size, stride,
                      grid_size: int = 7):
    """(B, H, W, C) BEV + (B, R, 7) rois → (B, R, G², C) sampled
    features at rotated in-box grid points."""
    g = grid_size
    lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    offsets = jnp.stack([gx.ravel(), gy.ravel()], -1)  # (G2, 2)

    def single(bev_b, rois_b):
        local = offsets[None] * rois_b[:, None, 3:5]  # (R, G2, 2)
        c, s = jnp.cos(rois_b[:, 6]), jnp.sin(rois_b[:, 6])
        wx = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
        wy = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
        pts = jnp.stack(
            [wx + rois_b[:, None, 0], wy + rois_b[:, None, 1]], axis=-1
        ).reshape(-1, 2)
        feats = bilinear_interpolate_bev(
            bev_b, pts, pc_range, voxel_size, stride
        )
        return feats.reshape(rois_b.shape[0], g * g, -1)

    return jax.vmap(single)(bev, rois)


@ROI_HEADS.register
class SECONDHead(nn.Module):
    model_cfg: dict
    num_class: int = 1
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)
    voxel_size: tuple = (0.05, 0.05, 0.1)

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        nms_key = "TRAIN" if train else "TEST"
        nms_cfg = self.model_cfg["NMS_CONFIG"][nms_key]
        num_rois = int(nms_cfg.get("NMS_POST_MAXSIZE", 512))
        batch_dict = roi_head_utils.proposal_layer(
            batch_dict, nms_cfg, num_rois
        )
        rois = batch_dict["rois"]
        bev = batch_dict["spatial_features_2d"]
        stride = batch_dict.get("spatial_features_stride", 8)

        pooled = bev_roi_grid_pool(
            bev, rois[..., :7], self.point_cloud_range, self.voxel_size,
            stride, grid_size=int(self.model_cfg.get("GRID_SIZE", 7)),
        )
        b, r = rois.shape[:2]
        flat = pooled.reshape(b, r, -1)
        iou_pred = FCStack(
            tuple(self.model_cfg.get("IOU_FC", [256, 256])), 1,
            use_bn=self.model_cfg.get("USE_BN", True),
        )(flat, train).squeeze(-1)
        batch_dict["rcnn_iou"] = iou_pred

        if train:
            gt = jax.lax.stop_gradient(batch_dict["gt_boxes"])

            def single(rois_b, gt_b):
                boxes = gt_b[:, :-1]
                gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
                iou = iou3d.boxes_iou3d(rois_b[:, :7], boxes[:, :7])
                iou = jnp.where(gt_valid[None, :], iou, 0.0)
                return jnp.max(iou, axis=-1)

            iou_target = jax.vmap(single)(rois, gt)
            batch_dict["rcnn_iou_labels"] = iou_target
        return batch_dict


def second_iou_head_loss(batch_dict, loss_cfg):
    """Smooth-L1 on (2·iou − 1) (reference second_head get_loss)."""
    pred = batch_dict["rcnn_iou"].reshape(-1)
    target = batch_dict["rcnn_iou_labels"].reshape(-1) * 2.0 - 1.0
    valid = batch_dict["roi_valid"].reshape(-1).astype(jnp.float32)
    loss = loss_utils.smooth_l1_loss(
        pred[:, None], target[:, None], weights=valid
    ).sum() / jnp.clip(valid.sum(), 1.0, None)
    w = loss_cfg["LOSS_WEIGHTS"].get("rcnn_iou_weight", 1.0)
    return loss * float(w), {"rcnn_loss_iou": loss}
