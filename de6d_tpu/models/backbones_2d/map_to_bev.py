"""Map-to-BEV modules.

Parity: reference map_to_bev/{pointpillar_scatter,height_compression,
conv2d_collapse}.py. Layout is NHWC (TPU-native) — the reference's
NCHW canvases become (B, ny, nx, C).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import MAP_TO_BEV


@MAP_TO_BEV.register
class PointPillarScatter(nn.Module):
    """Scatter (B, V, C) pillars into a dense (B, ny, nx, C) canvas
    (reference pointpillar_scatter.py:14-37)."""

    model_cfg: dict
    grid_size: tuple  # (nx, ny, nz)

    @property
    def num_bev_features(self):
        return int(self.model_cfg["NUM_BEV_FEATURES"])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        import os

        pillars = batch_dict["pillar_features"]  # (B, V, C)
        coords = batch_dict["voxel_coords"]  # (B, V, 3) zyx
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])
        c = pillars.shape[-1]
        g = ny * nx
        valid = coords[..., 0] >= 0
        # voxelize emits slots in ascending linear-key order with the
        # invalid (-1) slots at the tail — the Pallas kernel's contract
        lin = jnp.where(
            valid, coords[..., 1] * nx + coords[..., 2], g
        ).astype(jnp.int32)

        use_pallas = os.environ.get("DE6D_PALLAS_CANVAS")
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        else:
            use_pallas = use_pallas == "1"
        if use_pallas:
            # VMEM-resident tiled build: one-hot MXU row-select over
            # contiguous table blocks instead of a serialized ~214k-row
            # XLA gather (ops/pallas/canvas.py).
            from ...ops.pallas.canvas import scatter_canvas

            interpret = os.environ.get("DE6D_PALLAS_INTERPRET") == "1"
            batch_dict["spatial_features"] = scatter_canvas(
                pillars, lin, ny, nx, 256, interpret
            )
        else:

            def scatter_one(feat, lin1):
                # two-step canvas build: scatter only the int32 slot
                # ids into the grid (64x less scatter traffic than
                # scattering feature rows — TPU scatters serialize),
                # then GATHER the feature row per cell.
                v = feat.shape[0]
                ids = jnp.full((g + 1,), v, jnp.int32)
                ids = ids.at[lin1].set(jnp.arange(v, dtype=jnp.int32))
                fpad = jnp.concatenate(
                    [feat, jnp.zeros((1, c), feat.dtype)], axis=0
                )
                return fpad[ids[:g]].reshape(ny, nx, c)

            batch_dict["spatial_features"] = jax.vmap(scatter_one)(
                pillars, lin
            )
        batch_dict["spatial_features_stride"] = 1
        return batch_dict


@MAP_TO_BEV.register
class HeightCompression(nn.Module):
    """Reshape the dense(-ified) 3D feature volume's z dim into
    channels (reference height_compression.py:26). Consumes
    'encoded_spconv_tensor' as a dense (B, nz, ny, nx, C) volume from
    the sparse backbone's densify step."""

    model_cfg: dict
    grid_size: tuple = (0, 0, 0)

    @property
    def num_bev_features(self):
        return int(self.model_cfg["NUM_BEV_FEATURES"])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        vol = batch_dict["encoded_spconv_tensor"]  # (B, nz, ny, nx, C)
        b, nz, ny, nx, c = vol.shape
        bev = jnp.transpose(vol, (0, 2, 3, 1, 4)).reshape(b, ny, nx, nz * c)
        batch_dict["spatial_features"] = bev
        batch_dict["spatial_features_stride"] = batch_dict.get(
            "encoded_spconv_tensor_stride", 8
        )
        return batch_dict


@MAP_TO_BEV.register
class Conv2DCollapse(nn.Module):
    """Collapse the Z axis of a camera voxel volume into channels and
    reduce with a conv block (reference map_to_bev/conv2d_collapse.py:38
    — CaDDN only). Consumes 'voxel_features' (B, Z, Y, X, C) →
    'spatial_features' (B, Y, X, C_bev).

    Layout note: the reference flattens (C, Z) with C-major channel
    order; NHWC here flattens (Z, C) — a pure weight permutation."""

    model_cfg: dict
    grid_size: tuple  # (nx, ny, nz)

    @property
    def num_bev_features(self):
        return int(self.model_cfg["NUM_BEV_FEATURES"])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        from ..backbones_3d.vfe.image_vfe_modules.ffn import BasicBlock2D
        from ..model_utils.dtype_utils import compute_dtype

        vol = batch_dict["voxel_features"]  # (B, Z, Y, X, C)
        b, nz, ny, nx, c = vol.shape
        bev = jnp.transpose(vol, (0, 2, 3, 1, 4)).reshape(
            b, ny, nx, nz * c
        )
        args = dict(self.model_cfg.get("ARGS", {}))
        bev = BasicBlock2D(
            out_channels=self.num_bev_features,
            kernel_size=int(args.get("kernel_size", 1)),
            dtype=compute_dtype(self.model_cfg),
        )(bev, train)
        batch_dict["spatial_features"] = bev
        batch_dict["spatial_features_stride"] = 1
        return batch_dict
