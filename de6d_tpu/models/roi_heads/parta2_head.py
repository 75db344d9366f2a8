"""Part-A2 RoI head with RoI-aware part pooling.

Parity: reference roi_heads/partA2_head.py (:224) + the
roiaware_pool3d CUDA op (roiaware_pool3d_kernel.cu): pool the UNet's
per-voxel seg/part features into a G³ grid per roi (avg for part
features, max for semantic features), then sparse FC → cls/reg.

TPU design: each roi grid cell gathers the voxel site at its center
via the keyed lookup (nearest-voxel pooling — the dominant term of the
reference's in-cell average given unit-voxel cells), fixed shapes
throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sparse
from ...registry import ROI_HEADS
from ..model_utils.mlp import FCStack, SharedMLP
from . import roi_head_utils
from .pvrcnn_head import roi_grid_points


@ROI_HEADS.register
class PartA2FCHead(nn.Module):
    model_cfg: dict
    num_class: int = 1

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        nms_key = "TRAIN" if train else "TEST"
        nms_cfg = self.model_cfg["NMS_CONFIG"][nms_key]
        num_rois = int(nms_cfg.get("NMS_POST_MAXSIZE", 512))
        batch_dict = roi_head_utils.proposal_layer(
            batch_dict, nms_cfg, num_rois
        )
        if train:
            rng = self.make_rng("sampling") if self.has_rng("sampling") else (
                jax.random.PRNGKey(0)
            )
            targets = roi_head_utils.assign_roi_targets(
                batch_dict["rois"], batch_dict["roi_valid"],
                batch_dict["roi_labels"],
                jax.lax.stop_gradient(batch_dict["gt_boxes"]), rng,
                roi_per_image=int(
                    self.model_cfg["TARGET_CONFIG"].get("ROI_PER_IMAGE", 128)
                ),
            )
            batch_dict["rois"] = targets["rois"]
            batch_dict["roi_labels"] = targets["roi_labels"]
            batch_dict["roi_valid"] = targets["roi_sample_valid"]
            targets["gt_of_rois_local"] = (
                roi_head_utils.canonical_transform_targets(
                    targets["rois"][..., :7], targets["gt_of_rois"][..., :7]
                )
            )
        rois = batch_dict["rois"]
        b, r = rois.shape[:2]

        feats = batch_dict["point_features_unet"]  # (B, V, C)
        part = batch_dict["point_part_preds"]
        seg = batch_dict["point_cls_preds"]
        keys = batch_dict["point_keys_unet"]
        grid = batch_dict["point_grid_unet"]
        vs = batch_dict["voxel_size_xyz"]
        pc0 = batch_dict["pc_range_min"]

        g = int(self.model_cfg["ROI_AWARE_POOL"].get("POOL_SIZE", 12))
        grid_pts = roi_grid_points(rois[..., :7], g)  # (B, R, G3, 3)
        g3 = grid_pts.shape[2]

        def pool_one(f, p, s, k, pts):
            coords = jnp.stack(
                [
                    jnp.floor((pts[..., 2] - pc0[2]) / vs[2]).astype(jnp.int32),
                    jnp.floor((pts[..., 1] - pc0[1]) / vs[1]).astype(jnp.int32),
                    jnp.floor((pts[..., 0] - pc0[0]) / vs[0]).astype(jnp.int32),
                ],
                axis=-1,
            ).reshape(-1, 3)
            qkeys = sparse.coords_to_keys(coords, grid)
            idx, hit = sparse.lookup(k, qkeys)
            merged = jnp.concatenate(
                [jax.nn.sigmoid(s), jax.nn.sigmoid(p), f], axis=-1
            )
            out = jnp.where(hit[:, None], merged[idx], 0.0)
            return out.reshape(r, g3, -1)

        pooled = jax.vmap(pool_one)(feats, part, seg, keys, grid_pts)
        pooled = SharedMLP(
            tuple(self.model_cfg.get("SHARED_FC", [256, 256])),
            use_bn=self.model_cfg.get("USE_BN", True),
        )(pooled.reshape(b, r, -1), train)

        rcnn_cls = FCStack(
            tuple(self.model_cfg.get("CLS_FC", [256, 256])), self.num_class,
            use_bn=self.model_cfg.get("USE_BN", True),
        )(pooled, train).squeeze(-1)
        rcnn_reg = FCStack(
            tuple(self.model_cfg.get("REG_FC", [256, 256])), 7,
            use_bn=self.model_cfg.get("USE_BN", True),
        )(pooled, train)

        batch_dict["rcnn_cls"] = rcnn_cls
        batch_dict["rcnn_reg"] = rcnn_reg
        if train:
            targets["rcnn_cls"] = rcnn_cls
            targets["rcnn_reg"] = rcnn_reg
            batch_dict["roi_targets_dict"] = targets
        else:
            boxes = roi_head_utils.rcnn_box_decode(rois[..., :7], rcnn_reg)
            batch_dict["batch_box_preds"] = boxes
            batch_dict["batch_cls_preds"] = rcnn_cls[..., None]
            batch_dict["cls_preds_normalized"] = False
        return batch_dict
