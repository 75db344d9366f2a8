"""PointRCNN second-stage RoI head.

Parity: reference roi_heads/pointrcnn_head.py (:179) + the
roipoint_pool3d CUDA op (roipoint_pool3d_kernel.cu): per roi, pool up
to NUM_SAMPLED_POINTS points inside the (enlarged) box, canonical-
transform them into the roi frame, merge xyz/depth/score features, run
an SA encoder, then cls/reg FCs.

TPU design: point-in-roi pooling = the OBB containment test + first-k
selection (same trick as ball query); empty rois carry a zero mask
(reference marks pooled_empty_flag).
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


def roipoint_pool3d(points, point_feats, valid, rois, num_sampled: int,
                    extra_width=(0.0, 0.0, 0.0)):
    """(B, N, 3) points + (B, N, C) feats + (B, R, 7+) rois →
    pooled xyz (B, R, S, 3) local frame, feats (B, R, S, C),
    empty (B, R) bool."""

    def single(pts, feats, v, rois_b):
        big = geometry.enlarge_box3d(rois_b[:, :7], extra_width)
        inside = geometry.points_in_boxes_mask(pts, big)  # (R, N)
        inside = inside & v[None, :]
        n = pts.shape[0]
        order_key = jnp.where(
            inside, jnp.arange(n, dtype=jnp.int32)[None, :], n
        )
        neg, _ = jax.lax.top_k(-order_key, num_sampled)
        idx = -neg  # (R, S) first hits, n = miss
        hit = idx < n
        cnt = jnp.sum(hit, axis=-1)
        fill = jnp.where(cnt > 0, idx[:, 0], 0)
        idx = jnp.where(hit, idx, fill[:, None])
        pooled_xyz = pts[idx]  # (R, S, 3)
        pooled_feat = feats[idx]
        # canonical transform into roi frame
        local = pooled_xyz - rois_b[:, None, 0:3]
        local = geometry.rotate_points_along_z(local, -rois_b[:, 6])
        empty = cnt == 0
        pooled_feat = jnp.where(empty[:, None, None], 0.0, pooled_feat)
        local = jnp.where(empty[:, None, None], 0.0, local)
        return local, pooled_feat, empty

    return jax.vmap(single)(points, point_feats, valid, rois)


@ROI_HEADS.register
class PointRCNNHead(nn.Module):
    model_cfg: dict
    num_class: int = 1

    def setup(self):
        use_bn = self.model_cfg.get("USE_BN", True)
        self.num_rois_train = int(
            self.model_cfg["NMS_CONFIG"]["TRAIN"].get("NMS_POST_MAXSIZE", 512)
        )
        self.roi_per_image = int(
            self.model_cfg["TARGET_CONFIG"].get("ROI_PER_IMAGE", 128)
        )
        pool_cfg = self.model_cfg["ROI_POINT_POOL"]
        self.num_sampled = int(pool_cfg.get("NUM_SAMPLED_POINTS", 512))
        self.depth_norm = float(pool_cfg.get("DEPTH_NORMALIZER", 70.0))

        self.xyz_up = SharedMLP(
            tuple(self.model_cfg.get("XYZ_UP_LAYER", [64, 64])),
            use_bn=use_bn,
        )
        self.merge_down = SharedMLP(
            (self.model_cfg.get("XYZ_UP_LAYER", [64, 64])[-1],),
            use_bn=use_bn,
        )
        sa_cfg = self.model_cfg["SA_CONFIG"]
        self.sa_modules = [
            PointnetSAModuleFSMSG(
                npoint_list=(int(sa_cfg["NPOINTS"][k]),)
                if int(sa_cfg["NPOINTS"][k]) > 0 else (),
                sample_range_list=((0, -1),),
                sample_method_list=("d-fps",),
                radii=(float(sa_cfg["RADIUS"][k]),),
                nsamples=(int(sa_cfg["NSAMPLE"][k]),),
                mlps=(tuple(sa_cfg["MLPS"][k]),),
                use_bn=use_bn,
            )
            for k in range(len(sa_cfg["NPOINTS"]))
        ]
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
                    self.model_cfg["TARGET_CONFIG"].get(
                        "REG_FG_THRESH", 0.55
                    )
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

        coords = batch_dict["point_coords"]  # (B, N, 3)
        feats = batch_dict["point_features"]  # (B, N, C)
        valid = batch_dict.get(
            "point_valid", jnp.ones(coords.shape[:2], bool)
        )
        scores = batch_dict.get("point_cls_scores")
        depth = jnp.linalg.norm(coords, axis=-1) / self.depth_norm - 0.5
        extra = [depth[..., None]]
        if scores is not None:
            s = scores if scores.ndim == 3 else scores[..., None]
            extra.insert(0, s)
        feats_aug = jnp.concatenate(extra + [feats], axis=-1)

        pooled_xyz, pooled_feat, empty = roipoint_pool3d(
            coords, feats_aug, valid, rois, self.num_sampled
        )
        b, r, s, _ = pooled_xyz.shape

        # merge local xyz into the feature stream (reference xyz_up +
        # merge_down)
        xyz_feat = self.xyz_up(pooled_xyz, train)  # (B, R, S, C1)
        merged = self.merge_down(
            jnp.concatenate([xyz_feat, pooled_feat], axis=-1), train
        )
        # SA encoder over each roi's point set
        flat_xyz = pooled_xyz.reshape(b * r, s, 3)
        flat_feat = merged.reshape(b * r, s, -1)
        flat_valid = jnp.broadcast_to(
            ~empty.reshape(b * r)[:, None], (b * r, s)
        )
        x_xyz, x_feat, x_valid = flat_xyz, flat_feat, flat_valid
        for sa in self.sa_modules:
            if sa.npoint_list:
                x_xyz, x_feat, _, x_valid = sa(
                    x_xyz, x_feat, x_valid, train=train
                )
            else:  # global pooling stage: single group at origin
                center = jnp.zeros((b * r, 1, 3), x_xyz.dtype)
                _, x_feat, _, _ = sa(
                    x_xyz, x_feat, x_valid, new_xyz=center, train=train
                )
                x_xyz = center
                x_valid = jnp.ones((b * r, 1), bool)
        head_feat = x_feat.mean(axis=1).reshape(b, r, -1)

        rcnn_cls = self.cls_layers(head_feat, train).squeeze(-1)
        rcnn_reg = self.reg_layers(head_feat, train)
        rcnn_cls = jnp.where(empty, -1e4, rcnn_cls)

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
