"""Pillar feature networks.

Parity: reference PillarVFE (vfe/pillar_vfe.py:94-123 — PFN
linear+BN+ReLU+max with cluster/center offset features) and
DynamicPillarVFE (vfe/dynamic_pillar_vfe.py:40,105 — per-point PFN +
scatter_max, no per-pillar point cap; maps directly onto
jax.ops.segment_max as the reference's own comments anticipate).

TPU notes: the PFN linear is a (B·V·P, C)×(C, 64) GEMM — batched and
MXU-friendly. BatchNorm statistics are computed over all (padded)
positions, matching the reference which also normalizes over padded
zeros after masking.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops import voxelize
from ....registry import VFE
from ...model_utils.dtype_utils import compute_dtype


class PFNLayer(nn.Module):
    """One PFN stage (linear+BN+ReLU+segment-max). Two entry points
    share the same parameters: the padded-buffer path (``__call__``,
    (..., P, C) voxel buffers) and the fused sorted-point path
    (``mlp`` — per-point transform, caller does the segmented max)."""

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False
    dtype: object = jnp.float32

    @property
    def out_dim(self):
        return (
            self.out_channels if self.last_layer else self.out_channels // 2
        )

    def setup(self):
        self.dense = nn.Dense(
            self.out_dim, use_bias=not self.use_norm, dtype=self.dtype
        )
        if self.use_norm:
            self.bn = nn.BatchNorm(
                momentum=0.99, epsilon=1e-3, dtype=self.dtype
            )

    def mlp(self, inputs, train: bool):
        """(..., C) → (..., out_dim) per-position transform."""
        x = self.dense(inputs.astype(self.dtype))
        if self.use_norm:
            x = self.bn(x, use_running_average=not train)
        return nn.relu(x)

    def __call__(self, inputs, mask, train: bool):
        """inputs: (..., P, C); mask: (..., P) valid points."""
        out_c = self.out_dim
        x = self.mlp(inputs, train)
        x = jnp.where(mask[..., None], x, -1e9)
        x_max = jnp.max(x, axis=-2, keepdims=True)
        x_max = jnp.where(x_max <= -1e9, 0.0, x_max)
        if self.last_layer:
            return x_max.squeeze(-2)
        x_repeat = jnp.broadcast_to(
            x_max, x.shape[:-2] + (x.shape[-2], out_c)
        )
        return jnp.concatenate(
            [jnp.where(mask[..., None], x, 0.0), x_repeat], axis=-1
        )


def pillar_centers_from_coords(voxel_coords, voxel_size, pc_range, dtype):
    """(..., 3) zyx integer coords → (..., 3) xyz pillar centers."""
    vx, vy, vz = voxel_size
    x0, y0, z0 = pc_range[0], pc_range[1], pc_range[2]
    cx = voxel_coords[..., 2:3].astype(dtype) * vx + (vx / 2 + x0)
    cy = voxel_coords[..., 1:2].astype(dtype) * vy + (vy / 2 + y0)
    cz = voxel_coords[..., 0:1].astype(dtype) * vz + (vz / 2 + z0)
    return jnp.concatenate([cx, cy, cz], axis=-1)


def _pillar_point_features(
    xyz, extra, count_mask, centroid, center,
    use_absolute_xyz, with_distance,
):
    """Assemble the augmented per-point pillar features. centroid and
    center must broadcast against xyz."""
    f_cluster = xyz - centroid
    f_center = xyz - center
    feats = [xyz, extra] if use_absolute_xyz else [extra]
    feats += [f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    out = jnp.concatenate(feats, axis=-1)
    return jnp.where(count_mask[..., None], out, 0.0)


@VFE.register
class PillarVFE(nn.Module):
    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple

    @property
    def output_feature_dim(self):
        return int(self.model_cfg["NUM_FILTERS"][-1])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        num_filters = list(self.model_cfg["NUM_FILTERS"])
        use_norm = self.model_cfg.get("USE_NORM", True)
        dt = compute_dtype(self.model_cfg)
        layers = [
            PFNLayer(
                nf, use_norm=use_norm,
                last_layer=(i == len(num_filters) - 1), dtype=dt,
            )
            for i, nf in enumerate(num_filters)
        ]

        if "order" in batch_dict:
            # fused sorted-point path: never materializes the (V, P, C)
            # voxel buffer — per-point MLP over the sorted stream +
            # segmented max (gathers/scans only). Exactly equal to the
            # buffer path in eval; in train the BatchNorm statistics
            # run over N points instead of V*P padded rows, which
            # matches the reference DynamicPillarVFE convention.
            return self._fused(batch_dict, layers, train)

        voxels = batch_dict["voxels"]  # (B, V, P, C)
        num_points = batch_dict["voxel_num_points"]  # (B, V)
        coords = batch_dict["voxel_coords"]  # (B, V, 3) zyx

        p = voxels.shape[2]
        mask = (
            jnp.arange(p)[None, None, :] < num_points[..., None]
        )  # (B, V, P)
        xyz = voxels[..., :3]
        extra = voxels[..., 3:]
        centroid = jnp.sum(
            jnp.where(mask[..., None], xyz, 0.0), axis=-2, keepdims=True
        ) / jnp.clip(num_points[..., None, None], 1.0, None).astype(xyz.dtype)

        center = pillar_centers_from_coords(
            coords, self.voxel_size, self.point_cloud_range, xyz.dtype
        )  # (B, V, 3)
        feats = _pillar_point_features(
            xyz, extra, mask, centroid, center[..., None, :],
            self.model_cfg.get("USE_ABSLOTE_XYZ", True),
            self.model_cfg.get("WITH_DISTANCE", False),
        )

        for layer in layers:
            feats = layer(feats, mask, train)
        batch_dict["pillar_features"] = feats  # (B, V, C_out)
        return batch_dict

    def _fused(self, batch_dict, layers, train: bool):
        points = batch_dict["points"]  # (B, N, 3+C)
        order = batch_dict["order"]  # (B, N)
        slot = batch_dict["sorted_slot"]  # (B, N), -1 invalid
        starts = batch_dict["voxel_starts"]  # (B, V)
        counts = batch_dict["voxel_num_points"]  # (B, V) capped
        coords = batch_dict["voxel_coords"]  # (B, V, 3) zyx
        v = coords.shape[1]
        cap = int(batch_dict.get("_points_per_voxel_cap", 32))

        pts_sorted = jnp.take_along_axis(
            points, order[..., None], axis=1
        )  # (B, N, C)
        xyz = pts_sorted[..., :3]
        extra = pts_sorted[..., 3:]
        valid = slot >= 0

        # per-voxel centroid over the capped window (= reference mean
        # over the voxel buffer), via cumsum-diff — then back per point
        seg_sum = jax.vmap(
            lambda x_, i_, s_, c_: voxelize.sorted_segment_sum(
                x_, i_, s_, c_, window=cap
            )
        )(jnp.where(valid[..., None], xyz, 0.0), slot, starts, counts)
        centroid_v = seg_sum / jnp.clip(
            counts[..., None], 1, None
        ).astype(xyz.dtype)
        slot_c = jnp.clip(slot, 0, v - 1)
        centroid = jnp.take_along_axis(
            centroid_v, slot_c[..., None], axis=1
        )  # (B, N, 3)
        pt_coords = jnp.take_along_axis(
            coords, slot_c[..., None], axis=1
        )  # (B, N, 3)
        center = pillar_centers_from_coords(
            pt_coords, self.voxel_size, self.point_cloud_range, xyz.dtype
        )
        feats = _pillar_point_features(
            xyz, extra, valid, centroid, center,
            self.model_cfg.get("USE_ABSLOTE_XYZ", True),
            self.model_cfg.get("WITH_DISTANCE", False),
        )  # (B, N, F)

        for layer in layers:
            x = layer.mlp(feats, train)  # (B, N, out)
            x = jnp.where(valid[..., None], x, 0.0)
            x_max = jax.vmap(
                lambda x_, i_, s_, c_: voxelize.sorted_segment_max(
                    x_, i_, s_, c_, window=cap
                )
            )(x, slot, starts, counts)  # (B, V, out)
            if layer.last_layer:
                feats = x_max
            else:
                x_rep = jnp.take_along_axis(
                    x_max, slot_c[..., None], axis=1
                )
                feats = jnp.concatenate([x, x_rep], axis=-1)
        batch_dict["pillar_features"] = feats  # (B, V, C_out)
        return batch_dict


@VFE.register
class DynamicPillarVFE(nn.Module):
    """Per-point PFN + segment_max. Consumes 'points' (B, N, 3+C),
    'point_voxel_idx' (B, N) and 'voxel_coords' from the voxelizer."""

    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple

    @property
    def output_feature_dim(self):
        return int(self.model_cfg["NUM_FILTERS"][-1])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["points"]  # (B, N, 3+C)
        pvi = batch_dict["point_voxel_idx"]  # (B, N)
        coords = batch_dict["voxel_coords"]  # (B, V, 3)
        v = coords.shape[1]
        valid = pvi >= 0

        xyz = points[..., :3]
        extra = points[..., 3:]
        # per-voxel centroid of this point's pillar, gathered back
        means = []
        for b in range(points.shape[0]):
            mean_b, _ = voxelize.segment_mean(xyz[b], pvi[b], v)
            means.append(mean_b[jnp.clip(pvi[b], 0, v - 1)])
        centroid = jnp.stack(means, axis=0)
        pt_coords = jnp.take_along_axis(
            coords, jnp.clip(pvi, 0, v - 1)[..., None], axis=1
        )  # (B, N, 3)
        center = pillar_centers_from_coords(
            pt_coords, self.voxel_size, self.point_cloud_range, xyz.dtype
        )  # (B, N, 3)
        feats = _pillar_point_features(
            xyz, extra, valid, centroid, center,
            self.model_cfg.get("USE_ABSLOTE_XYZ", True),
            self.model_cfg.get("WITH_DISTANCE", False),
        )

        use_norm = self.model_cfg.get("USE_NORM", True)
        dt = compute_dtype(self.model_cfg)
        feats = feats.astype(dt)
        for i, nf in enumerate(self.model_cfg["NUM_FILTERS"]):
            feats = nn.Dense(nf, use_bias=not use_norm, dtype=dt)(feats)
            if use_norm:
                feats = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    dtype=dt,
                )(feats)
            feats = nn.relu(feats)
        pillars = []
        for b in range(points.shape[0]):
            pillars.append(
                voxelize.segment_max(feats[b], pvi[b], v, valid[b])
            )
        batch_dict["pillar_features"] = jnp.stack(pillars, axis=0)
        return batch_dict
