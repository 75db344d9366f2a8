"""Camera/grid transform helpers for the CaDDN camera path.

Parity: reference core/pcdet/utils/transform_utils.py (project_to_image
:15-36, normalize_coords :39-54, bin_depths :57-91) — rewritten as pure
jnp; the kornia homogeneous-point helpers are inlined.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def project_to_image(project, points):
    """Project 3D points through a (..., 3, 4) projection matrix.

    Args:
        project: (..., 3, 4) camera projection matrices (broadcastable
            against points' batch dims).
        points: (..., 3) 3D points.
    Returns:
        points_img: (..., 2) image-plane coords (u, v),
        points_depth: (...,) depths.
    """
    ones = jnp.ones_like(points[..., :1])
    pts_h = jnp.concatenate([points, ones], axis=-1)  # (..., 4)
    pts_t = jnp.einsum("...ij,...j->...i", project, pts_h)  # (..., 3)
    depth = pts_t[..., 2] - project[..., 2, 3]
    points_img = pts_t[..., :2] / jnp.where(
        jnp.abs(pts_t[..., 2:3]) < 1e-8, 1e-8, pts_t[..., 2:3]
    )
    return points_img, depth


def normalize_coords(coords, shape):
    """Normalize grid coordinates to [-1, 1] (align_corners
    convention). coords: (..., 3) in (x, y, z)-like order; shape: (3,)
    grid extents ordered so that reversed(shape) aligns with coords'
    last-dim order (matching the reference's flip)."""
    shape = jnp.flip(jnp.asarray(shape, coords.dtype), axis=0)
    return coords / (shape - 1) * 2.0 - 1.0


def bin_depths(depth_map, mode, depth_min, depth_max, num_bins,
               target=False):
    """Depth (m) → continuous bin index (or int target with the
    overflow bin). Modes per arXiv:2005.13423: UD / LID / SID."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * jnp.sqrt(
            jnp.clip(1 + 8 * (depth_map - depth_min) / bin_size, 0.0, None)
        )
    elif mode == "SID":
        indices = (
            num_bins
            * (jnp.log(1 + depth_map) - math.log(1 + depth_min))
            / (math.log(1 + depth_max) - math.log(1 + depth_min))
        )
    else:
        raise NotImplementedError(f"unknown depth mode {mode}")

    if target:
        bad = (
            (indices < 0) | (indices > num_bins) | ~jnp.isfinite(indices)
        )
        indices = jnp.where(bad, num_bins, indices)
        indices = indices.astype(jnp.int32)
    return indices
