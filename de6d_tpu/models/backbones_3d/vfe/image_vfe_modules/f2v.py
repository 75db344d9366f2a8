"""Frustum-to-voxel transform.

Parity: reference FrustumToVoxel / FrustumGridGenerator / Sampler
(.../image_vfe_modules/f2v/*.py): build the LiDAR voxel-center grid,
project it through lidar→cam→image, convert depths to bin indices,
normalize, and trilinearly sample the frustum volume.

TPU-first: the kornia meshgrid/transform plumbing is replaced by a
direct index→lidar affine + einsum projection; sampling is the
fixed-shape 8-tap gather in ops/grid_sample.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .....ops.grid_sample import grid_sample_3d
from .....utils import transform_utils

OUT_OF_BOUNDS = -2.0


def frustum_grid(lidar_to_cam, cam_to_img, image_shape, grid_size,
                 pc_range, disc_cfg):
    """Normalized frustum sampling grid for each batch element.

    Args:
        lidar_to_cam: (B, 4, 4); cam_to_img: (B, 3, 4);
        image_shape: (B, 2) [H, W] full-image shape;
        grid_size: static (X, Y, Z); pc_range: static 6-list;
        disc_cfg: dict(mode, depth_min, depth_max, num_bins).
    Returns:
        (B, X, Y, Z, 3) grid, last dim (u, v, depth-bin) normalized to
        [-1, 1]; non-finite entries become the out-of-bounds value.
    """
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    pc_min = jnp.asarray(pc_range[0:3], jnp.float32)
    pc_max = jnp.asarray(pc_range[3:6], jnp.float32)
    voxel_size = (pc_max - pc_min) / jnp.asarray(
        [nx, ny, nz], jnp.float32
    )

    ix, iy, iz = jnp.meshgrid(
        jnp.arange(nx, dtype=jnp.float32),
        jnp.arange(ny, dtype=jnp.float32),
        jnp.arange(nz, dtype=jnp.float32),
        indexing="ij",
    )
    idx = jnp.stack([ix, iy, iz], axis=-1) + 0.5  # (X, Y, Z, 3)
    xyz = idx * voxel_size + pc_min  # lidar-frame voxel centers

    ones = jnp.ones_like(xyz[..., :1])
    xyz_h = jnp.concatenate([xyz, ones], axis=-1)  # (X, Y, Z, 4)
    cam = jnp.einsum(
        "bij,xyzj->bxyzi", lidar_to_cam, xyz_h
    )[..., :3]  # (B, X, Y, Z, 3)

    proj = cam_to_img[:, None, None, None]  # (B, 1, 1, 1, 3, 4)
    img, depth = transform_utils.project_to_image(proj, cam)
    dbin = transform_utils.bin_depths(
        depth, mode=disc_cfg["mode"],
        depth_min=float(disc_cfg["depth_min"]),
        depth_max=float(disc_cfg["depth_max"]),
        num_bins=int(disc_cfg["num_bins"]),
    )
    grid = jnp.concatenate([img, dbin[..., None]], axis=-1)

    shape_hw = jnp.max(image_shape, axis=0).astype(jnp.float32)  # (2,)
    frustum_shape = jnp.concatenate(
        [jnp.asarray([float(disc_cfg["num_bins"])]), shape_hw]
    )  # (D, H, W)
    grid = transform_utils.normalize_coords(grid, frustum_shape)
    grid = jnp.where(jnp.isfinite(grid), grid, OUT_OF_BOUNDS)
    return grid


def frustum_to_voxel(batch_dict, grid_size, pc_range, disc_cfg):
    """frustum_features (B, D, h, w, C) → voxel_features
    (B, Z, Y, X, C) via trilinear sampling at the projected voxel
    centers (reference frustum_to_voxel.py:30-56)."""
    grid = frustum_grid(
        batch_dict["trans_lidar_to_cam"],
        batch_dict["trans_cam_to_img"],
        batch_dict["image_shape"],
        grid_size, pc_range, disc_cfg,
    )  # (B, X, Y, Z, 3)
    vox = jax.vmap(grid_sample_3d)(
        batch_dict["frustum_features"], grid
    )  # (B, X, Y, Z, C)
    batch_dict["voxel_features"] = jnp.transpose(vox, (0, 3, 2, 1, 4))
    return batch_dict
