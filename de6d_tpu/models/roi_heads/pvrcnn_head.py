"""PV-RCNN RoI head with RoI-grid pooling.

Parity: reference roi_heads/pvrcnn_head.py (:175): 6×6×6 grid points
per roi (canonical frame → world), keypoint features grouped around
each grid point with two-radius SA, then shared FC → cls/reg.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import geometry
from ...registry import ROI_HEADS
from ..backbones_3d.pointnet2_modules import PointnetSAModuleFSMSG
from ..model_utils.mlp import FCStack, SharedMLP
from . import roi_head_utils


def roi_grid_points(rois, grid_size: int):
    """(B, R, 7+) → world-frame grid points (B, R, G³, 3)."""
    g = grid_size
    lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5  # (-0.5, 0.5)
    gz, gy, gx = jnp.meshgrid(lin, lin, lin, indexing="ij")
    offsets = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)  # (G3, 3)

    local = offsets[None, None] * rois[..., None, 3:6]  # (B, R, G3, 3)
    b, r, g3, _ = local.shape
    world = geometry.rotate_points_along_z(
        local.reshape(b * r, g3, 3), rois[..., 6].reshape(-1)
    ).reshape(b, r, g3, 3)
    return world + rois[..., None, 0:3]


@ROI_HEADS.register
class PVRCNNHead(nn.Module):
    model_cfg: dict
    num_class: int = 1

    def setup(self):
        use_bn = self.model_cfg.get("USE_BN", True)
        pool_cfg = self.model_cfg["ROI_GRID_POOL"]
        self.grid_size = int(pool_cfg["GRID_SIZE"])
        self.pool_sa = PointnetSAModuleFSMSG(
            radii=tuple(float(r) for r in pool_cfg["POOL_RADIUS"]),
            nsamples=tuple(int(s) for s in pool_cfg["NSAMPLE"]),
            mlps=tuple(tuple(m) for m in pool_cfg["MLPS"]),
            use_xyz=True,
            use_bn=use_bn,
        )
        self.roi_per_image = int(
            self.model_cfg["TARGET_CONFIG"].get("ROI_PER_IMAGE", 128)
        )
        self.shared_fc = SharedMLP(
            tuple(self.model_cfg["SHARED_FC"]), use_bn=use_bn
        )
        self.cls_layers = FCStack(
            tuple(self.model_cfg["CLS_FC"]), self.num_class, use_bn=use_bn
        )
        self.reg_layers = FCStack(
            tuple(self.model_cfg["REG_FC"]), 7, use_bn=use_bn
        )

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
                roi_per_image=self.roi_per_image,
                fg_ratio=float(
                    self.model_cfg["TARGET_CONFIG"].get("FG_RATIO", 0.5)
                ),
                fg_thresh=float(
                    self.model_cfg["TARGET_CONFIG"].get("REG_FG_THRESH", 0.55)
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

        grid_pts = roi_grid_points(rois[..., :7], self.grid_size)
        g3 = grid_pts.shape[2]
        kp = batch_dict["point_coords"]  # (B, K, 3)
        kp_feats = batch_dict["point_features"]
        kp_valid = batch_dict.get(
            "point_valid", jnp.ones(kp.shape[:2], bool)
        )
        # weight keypoint features by predicted foreground score
        # (reference PointHeadSimple score weighting)
        if "point_cls_scores" in batch_dict:
            s = batch_dict["point_cls_scores"]
            s = s if s.ndim == 2 else jnp.max(s, axis=-1)
            kp_feats = kp_feats * s[..., None]

        _, pooled, _, _ = self.pool_sa(
            kp, kp_feats, kp_valid,
            new_xyz=grid_pts.reshape(b, r * g3, 3),
            new_valid=jnp.ones((b, r * g3), bool),
            train=train,
        )  # (B, R*G3, C)
        pooled = pooled.reshape(b, r, g3 * pooled.shape[-1])

        shared = self.shared_fc(pooled, train)
        rcnn_cls = self.cls_layers(shared, train).squeeze(-1)
        rcnn_reg = self.reg_layers(shared, train)

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
