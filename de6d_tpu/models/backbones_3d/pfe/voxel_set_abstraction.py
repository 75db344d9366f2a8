"""Voxel Set Abstraction (PV-RCNN keypoint feature extraction).

Parity: reference backbones_3d/pfe/voxel_set_abstraction.py
(:124-411): FPS keypoints from raw points; per keypoint aggregate
(a) bilinear BEV features, (b) raw-point SA groups, (c) SA groups over
the sparse backbone's multi-scale voxel centers; concat → keypoint
features for the PV-RCNN head; 'sectorized-fps' variant supported.

TPU design: the reference's ragged stack-SA becomes batched masked SA
(pointnet2_modules); voxel centers come straight from the sorted key
lists of the sparse backbone (ops/sparse.keys_to_coords).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops import sampling, sparse
from ....registry import PFE
from ..pointnet2_modules import PointnetSAModuleFSMSG
from ..sampling_ground import sectorized_farthest_point_sample
from ...model_utils.mlp import SharedMLP


def bilinear_interpolate_bev(bev, xy, pc_range, voxel_size, stride):
    """bev (H, W, C) [H=y, W=x]; xy (K, 2) world coords → (K, C)."""
    x_idx = (xy[:, 0] - pc_range[0]) / voxel_size[0] / stride
    y_idx = (xy[:, 1] - pc_range[1]) / voxel_size[1] / stride
    x0 = jnp.floor(x_idx).astype(jnp.int32)
    y0 = jnp.floor(y_idx).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    h, w = bev.shape[0], bev.shape[1]
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)
    wa = (x1 - x_idx) * (y1 - y_idx)
    wb = (x1 - x_idx) * (y_idx - y0)
    wc = (x_idx - x0) * (y1 - y_idx)
    wd = (x_idx - x0) * (y_idx - y0)
    return (
        bev[y0c, x0c] * wa[:, None]
        + bev[y1c, x0c] * wb[:, None]
        + bev[y0c, x1c] * wc[:, None]
        + bev[y1c, x1c] * wd[:, None]
    )


@PFE.register
class VoxelSetAbstraction(nn.Module):
    model_cfg: dict
    voxel_size: tuple
    point_cloud_range: tuple

    @property
    def num_point_features(self):
        return int(self.model_cfg["NUM_OUTPUT_FEATURES"])

    def _sample_keypoints(self, points, mask):
        n_kp = int(self.model_cfg["NUM_KEYPOINTS"])
        method = str(self.model_cfg.get("SAMPLE_METHOD", "FPS"))
        xyz = points[..., :3]
        if method == "FPS":
            idx = sampling.farthest_point_sample(xyz, n_kp, mask)
        elif method == "SPC" or method.lower() == "sectorized-fps":
            idx = sectorized_farthest_point_sample(xyz, n_kp, mask)
        else:
            raise NotImplementedError(method)
        kp = sampling.gather_points(xyz, idx)
        kp_valid = jnp.take_along_axis(mask, idx, axis=1)
        return kp, kp_valid

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        points = batch_dict["points"]
        mask = batch_dict.get(
            "points_mask", jnp.any(points[..., :3] != 0, axis=-1)
        )
        keypoints, kp_valid = self._sample_keypoints(points, mask)
        b, k, _ = keypoints.shape

        features_list = []
        sources = list(cfg["FEATURES_SOURCE"])
        sa_cfg = cfg.get("SA_LAYER", {})

        if "bev" in sources:
            bev = batch_dict["spatial_features"]  # (B, H, W, C)
            stride = batch_dict.get("spatial_features_stride", 8)
            feats = jax.vmap(
                lambda bv, xy: bilinear_interpolate_bev(
                    bv, xy, self.point_cloud_range, self.voxel_size, stride
                )
            )(bev, keypoints[..., :2])
            features_list.append(feats)

        if "raw_points" in sources:
            src = sa_cfg["raw_points"]
            feats = points[..., 3:] if points.shape[-1] > 3 else None
            if str(src.get("NAME", "")) == "VectorPoolAggregationModuleMSG":
                # PV-RCNN++ VectorPool aggregation (reference
                # pointnet2_stack/pointnet2_modules.py:430)
                from ..vectorpool import VectorPoolAggregationModuleMSG

                if feats is None:
                    feats = jnp.ones(points.shape[:2] + (1,), points.dtype)
                f = VectorPoolAggregationModuleMSG(model_cfg=src)(
                    points[..., :3], feats, mask,
                    keypoints, kp_valid, train,
                )
            else:
                sa = PointnetSAModuleFSMSG(
                    radii=tuple(float(r) for r in src["POOL_RADIUS"]),
                    nsamples=tuple(int(s) for s in src["NSAMPLE"]),
                    mlps=tuple(tuple(m) for m in src["MLPS"]),
                    use_xyz=True,
                    pc_range=tuple(self.point_cloud_range),
                )
                _, f, _, _ = sa(
                    points[..., :3], feats, mask,
                    new_xyz=keypoints, new_valid=kp_valid, train=train,
                )
            features_list.append(f)

        ms = batch_dict.get("multi_scale_3d_features", {})
        vs = jnp.asarray(self.voxel_size)
        pc0 = jnp.asarray(self.point_cloud_range[:3])
        for name in sources:
            if name not in ms:
                continue
            feats_v, keys_v, grid_v = ms[name]
            stride = batch_dict.get("multi_scale_3d_strides", {}).get(
                name, 1
            )

            def centers_one(keys):
                c = sparse.keys_to_coords(keys, grid_v)  # (V, 3) zyx
                xyz = jnp.stack(
                    [
                        (c[:, 2].astype(jnp.float32) + 0.5) * vs[0] * stride
                        + pc0[0],
                        (c[:, 1].astype(jnp.float32) + 0.5) * vs[1] * stride
                        + pc0[1],
                        (c[:, 0].astype(jnp.float32) + 0.5) * vs[2] * stride
                        + pc0[2],
                    ],
                    axis=-1,
                )
                return xyz, keys != sparse.INVALID

            centers, cvalid = jax.vmap(centers_one)(keys_v)
            src = sa_cfg[name]
            if str(src.get("NAME", "")) == "VectorPoolAggregationModuleMSG":
                from ..vectorpool import VectorPoolAggregationModuleMSG

                f = VectorPoolAggregationModuleMSG(model_cfg=src)(
                    centers, feats_v, cvalid, keypoints, kp_valid, train,
                )
            else:
                sa = PointnetSAModuleFSMSG(
                    radii=tuple(float(r) for r in src["POOL_RADIUS"]),
                    nsamples=tuple(int(s) for s in src["NSAMPLE"]),
                    mlps=tuple(tuple(m) for m in src["MLPS"]),
                    use_xyz=True,
                    pc_range=tuple(self.point_cloud_range),
                )
                _, f, _, _ = sa(
                    centers, feats_v, cvalid,
                    new_xyz=keypoints, new_valid=kp_valid, train=train,
                )
            features_list.append(f)

        kp_features = jnp.concatenate(features_list, axis=-1)
        batch_dict["point_features_before_fusion"] = kp_features
        out = SharedMLP((int(cfg["NUM_OUTPUT_FEATURES"]),), use_bn=True)(
            kp_features, train
        )
        batch_dict["point_features"] = out
        batch_dict["point_coords"] = keypoints
        batch_dict["point_valid"] = kp_valid
        return batch_dict
