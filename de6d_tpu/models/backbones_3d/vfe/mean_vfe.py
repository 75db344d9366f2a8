"""Mean voxel feature encoders.

Parity: reference MeanVFE (vfe/mean_vfe.py:31 — mean over the points
in each voxel) and DynamicMeanVFE (vfe/dynamic_mean_vfe.py — scatter
mean over point→voxel ids with no per-voxel point cap).

Shapes: batch_dict['voxels'] (B, V, P, C), 'voxel_num_points' (B, V);
the dynamic variant consumes 'points' (B, N, C) + 'point_voxel_idx'
(B, N) from the fused voxelizer instead.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ....ops import voxelize
from ....registry import VFE


@VFE.register
class MeanVFE(nn.Module):
    model_cfg: dict
    num_point_features: int

    @property
    def output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        voxels = batch_dict["voxels"]  # (B, V, P, C)
        num_points = batch_dict["voxel_num_points"]  # (B, V)
        total = jnp.sum(voxels, axis=2)
        denom = jnp.clip(num_points[..., None], 1.0, None).astype(voxels.dtype)
        batch_dict["voxel_features"] = total / denom
        return batch_dict


@VFE.register
class DynamicMeanVFE(nn.Module):
    model_cfg: dict
    num_point_features: int
    max_voxels: int = 0

    @property
    def output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["points"]  # (B, N, C)
        pvi = batch_dict["point_voxel_idx"]  # (B, N)
        v = batch_dict["voxels"].shape[1] if "voxels" in batch_dict else self.max_voxels
        feats = []
        for b in range(points.shape[0]):
            mean, _ = voxelize.segment_mean(points[b], pvi[b], v)
            feats.append(mean)
        batch_dict["voxel_features"] = jnp.stack(feats, axis=0)
        return batch_dict
