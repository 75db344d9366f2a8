"""Voxel-RCNN RoI head with voxel-query grid pooling.

Parity: reference roi_heads/voxelrcnn_head.py (:262) + the
voxel_query CUDA op (voxel_query_kernel_stack): per roi-grid point,
gather neighboring ACTIVE voxels from chosen backbone scales (the
reference queries a Manhattan ball via a hash grid; here a 3³
neighborhood keyed lookup), pool with an MLP, then shared FC →
cls/reg.
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

NEIGHBOR_OFFSETS = [
    (dz, dy, dx)
    for dz in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dx in (-1, 0, 1)
]


def voxel_query_pool(feats, keys, grid, grid_pts, vs, pc0, stride):
    """Gather 3³ neighborhoods of active voxels around each query
    point; returns (B, Q, 27, C) with zero for misses."""

    def one(f, k, pts):
        cz = jnp.floor((pts[:, 2] - pc0[2]) / (vs[2] * stride)).astype(jnp.int32)
        cy = jnp.floor((pts[:, 1] - pc0[1]) / (vs[1] * stride)).astype(jnp.int32)
        cx = jnp.floor((pts[:, 0] - pc0[0]) / (vs[0] * stride)).astype(jnp.int32)
        outs = []
        for dz, dy, dx in NEIGHBOR_OFFSETS:
            coords = jnp.stack([cz + dz, cy + dy, cx + dx], axis=-1)
            qkeys = sparse.coords_to_keys(coords, grid)
            idx, hit = sparse.lookup(k, qkeys)
            outs.append(jnp.where(hit[:, None], f[idx], 0.0))
        return jnp.stack(outs, axis=1)  # (Q, 27, C)

    return jax.vmap(one)(feats, keys, grid_pts)


@ROI_HEADS.register
class VoxelRCNNHead(nn.Module):
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
        vs = batch_dict["voxel_size_xyz"]
        pc0 = batch_dict["pc_range_min"]

        pool_cfg = self.model_cfg["ROI_GRID_POOL"]
        g = int(pool_cfg.get("GRID_SIZE", 6))
        grid_pts = roi_grid_points(rois[..., :7], g)  # (B, R, G3, 3)
        g3 = grid_pts.shape[2]
        flat_pts = grid_pts.reshape(b, r * g3, 3)

        ms = batch_dict["multi_scale_3d_features"]
        strides = batch_dict.get("multi_scale_3d_strides", {})
        pooled_list = []
        for name in pool_cfg.get("FEATURES_SOURCE", ["x_conv3", "x_conv4"]):
            feats_v, keys_v, grid_v = ms[name]
            nb = voxel_query_pool(
                feats_v, keys_v, grid_v, flat_pts, vs, pc0,
                strides.get(name, 1),
            )  # (B, Q, 27, C)
            mlp_spec = pool_cfg.get("POOL_MLPS", {}).get(name, [32, 32])
            h = SharedMLP(
                tuple(mlp_spec), use_bn=self.model_cfg.get("USE_BN", True)
            )(nb, train)
            pooled_list.append(jnp.max(h, axis=2))
        pooled = jnp.concatenate(pooled_list, axis=-1)  # (B, Q, C')
        pooled = pooled.reshape(b, r, -1)

        shared = SharedMLP(
            tuple(self.model_cfg.get("SHARED_FC", [256, 256])),
            use_bn=self.model_cfg.get("USE_BN", True),
        )(pooled, train)
        rcnn_cls = FCStack(
            tuple(self.model_cfg.get("CLS_FC", [256, 256])), self.num_class,
            use_bn=self.model_cfg.get("USE_BN", True),
        )(shared, train).squeeze(-1)
        rcnn_reg = FCStack(
            tuple(self.model_cfg.get("REG_FC", [256, 256])), 7,
            use_bn=self.model_cfg.get("USE_BN", True),
        )(shared, train)

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
