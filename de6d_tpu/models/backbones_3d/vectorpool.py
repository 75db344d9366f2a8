"""VectorPool aggregation (PV-RCNN++).

Parity: reference VectorPoolAggregationModule(MSG) and
VectorPoolLocalInterpolateModule
(ops/pointnet2/pointnet2_stack/pointnet2_modules.py:160-470 with the
CUDA kernels in vector_pool_gpu.cu:485): each keypoint owns a dense
nx×ny×nz local voxel grid inside radius R; every grid center is filled
by inverse-distance 3-NN interpolation of (channel-reduced) support
features; a per-voxel (grouped) linear + BN + ReLU then post-MLPs
produce the aggregated feature; MSG runs several grid configs and
fuses them with the keypoint xyz.

TPU-first: the reference's two-step hashed neighbor search becomes a
fixed-size ball query around the keypoint (radius × multiplier,
NEIGHBOR_NSAMPLE capped) followed by a masked 3-NN among those
neighbors — dense (M, V, K) math instead of dynamic neighbor lists.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import ball_query as bq
from ..model_utils.mlp import SharedMLP


def _grid_offsets(num_voxels, radius):
    """Static (V, 3) local voxel-center offsets (reference
    get_dense_voxels_by_center :340-366)."""
    nx, ny, nz = num_voxels
    r = radius

    def centers(n):
        return np.arange(-r + r / n, r - r / n + 1e-5, 2 * r / n)

    gx, gy, gz = np.meshgrid(
        centers(nx), centers(ny), centers(nz), indexing="ij"
    )
    return np.stack(
        [gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=-1
    ).astype(np.float32)


class VectorPoolAggregation(nn.Module):
    """One group (reference VectorPoolAggregationModule, interpolation
    variant)."""

    num_local_voxel: tuple
    max_neighbor_distance: float
    neighbor_nsample: int
    num_reduced_channels: int
    num_channels_of_local_aggregation: int
    post_mlps: tuple
    neighbor_distance_multiplier: float = 2.0

    @nn.compact
    def __call__(self, xyz, features, valid, new_xyz, new_valid,
                 train: bool = False):
        """xyz (B, N, 3); features (B, N, C); new_xyz (B, M, 3) →
        (B, M, post_mlps[-1])."""
        b, n, c = features.shape
        m = new_xyz.shape[1]
        red = self.num_reduced_channels
        assert c % red == 0, (c, red)
        feats = features.reshape(b, n, c // red, red).sum(axis=2)

        v = int(np.prod(self.num_local_voxel))
        offsets = jnp.asarray(
            _grid_offsets(self.num_local_voxel, self.max_neighbor_distance)
        )  # (V, 3)
        grid = new_xyz[:, :, None, :] + offsets[None, None]  # (B, M, V, 3)

        k = self.neighbor_nsample if self.neighbor_nsample > 0 else 32
        idx, cnt = bq.ball_query(
            xyz, new_xyz,
            radius=float(
                self.max_neighbor_distance
                * self.neighbor_distance_multiplier
            ),
            nsample=int(k), valid_mask=valid, new_valid_mask=new_valid,
        )  # (B, M, K), (B, M)
        nbr_xyz = jnp.take_along_axis(
            xyz, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b, m, k, 3)
        nbr_feats = jnp.take_along_axis(
            feats, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b, m, k, red)
        nbr_valid = (
            jnp.arange(k)[None, None, :] < cnt[..., None]
        )  # (B, M, K)

        # masked 3-NN of every grid center among the K neighbors
        d2 = jnp.sum(
            (grid[:, :, :, None, :] - nbr_xyz[:, :, None, :, :]) ** 2,
            axis=-1,
        )  # (B, M, V, K)
        d2 = jnp.where(nbr_valid[:, :, None, :], d2, jnp.inf)
        neg, nn3 = jax.lax.top_k(-d2, 3)  # (B, M, V, 3)
        dist = jnp.sqrt(jnp.clip(-neg, 0.0, None))
        hit = jnp.isfinite(neg)
        w = 1.0 / (dist + 1e-8)
        w = jnp.where(hit, w, 0.0)
        w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-8, None)

        f3 = jnp.take_along_axis(
            nbr_feats[:, :, None].repeat(v, axis=2), nn3[..., None], axis=3
        )  # (B, M, V, 3, red)
        interp = jnp.sum(w[..., None] * f3, axis=-2)  # (B, M, V, red)
        x3 = jnp.take_along_axis(
            nbr_xyz[:, :, None].repeat(v, axis=2), nn3[..., None], axis=3
        )  # (B, M, V, 3, 3)
        local = grid[:, :, :, None, :] - x3
        local = jnp.where(hit[..., None], local, 0.0).reshape(
            b, m, v, 9
        )
        empty = ~jnp.any(hit, axis=-1)  # (B, M, V)
        per_voxel = jnp.concatenate([interp, local], axis=-1)
        per_voxel = jnp.where(empty[..., None], 0.0, per_voxel)

        # per-voxel (grouped) linear + shared BN/ReLU (reference
        # separate_local_aggregation_layer: Conv1d groups=V)
        wloc = self.param(
            "local_agg_kernel",
            nn.initializers.kaiming_normal(),
            (v, red + 9, self.num_channels_of_local_aggregation),
        )
        y = jnp.einsum("bmvc,vcd->bmvd", per_voxel, wloc)
        y = y.reshape(b, m, v * self.num_channels_of_local_aggregation)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )(y)
        y = nn.relu(y)
        y = SharedMLP(tuple(self.post_mlps))(y, train)
        return y


class VectorPoolAggregationModuleMSG(nn.Module):
    """MSG wrapper (reference :430-470): several grid configs, concat
    with the keypoint xyz, fuse with MSG_POST_MLPS."""

    model_cfg: dict

    @nn.compact
    def __call__(self, xyz, features, valid, new_xyz, new_valid,
                 train: bool = False):
        cfg = self.model_cfg
        outs = []
        for g in range(int(cfg["NUM_GROUPS"])):
            gc = cfg[f"GROUP_CFG_{g}"]
            outs.append(VectorPoolAggregation(
                num_local_voxel=tuple(gc["NUM_LOCAL_VOXEL"]),
                max_neighbor_distance=float(gc["MAX_NEIGHBOR_DISTANCE"]),
                neighbor_nsample=int(gc.get("NEIGHBOR_NSAMPLE", -1)),
                num_reduced_channels=int(
                    cfg.get("NUM_REDUCED_CHANNELS", 30)
                ),
                num_channels_of_local_aggregation=int(
                    cfg["NUM_CHANNELS_OF_LOCAL_AGGREGATION"]
                ),
                post_mlps=tuple(gc["POST_MLPS"]),
            )(xyz, features, valid, new_xyz, new_valid, train))
        fused = jnp.concatenate([new_xyz] + outs, axis=-1)
        fused = SharedMLP(tuple(cfg["MSG_POST_MLPS"]))(fused, train)
        return fused
