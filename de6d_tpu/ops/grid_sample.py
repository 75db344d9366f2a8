"""Trilinear 3D grid sampling (torch ``F.grid_sample`` semantics).

TPU-native replacement for the reference CaDDN sampler
(core/pcdet/models/backbones_3d/vfe/image_vfe_modules/f2v/sampler.py):
align_corners=True, zeros padding, bilinear (trilinear) mode — written
as 8 corner gathers + weighted sum, NDHWC layout (channels last rides
the TPU lanes).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_3d(volume, grid):
    """Sample a (D, H, W, C) volume at normalized grid locations.

    Args:
        volume: (D, H, W, C).
        grid: (..., 3) normalized coords in [-1, 1], ordered (x, y, z)
            where x indexes W, y indexes H, z indexes D (torch
            grid_sample convention, align_corners=True).
    Returns:
        (..., C) sampled features; out-of-range taps contribute zero.
    """
    d, h, w, c = volume.shape
    gx, gy, gz = grid[..., 0], grid[..., 1], grid[..., 2]
    # align_corners=True: -1 → 0, +1 → size-1
    fx = (gx + 1.0) * 0.5 * (w - 1)
    fy = (gy + 1.0) * 0.5 * (h - 1)
    fz = (gz + 1.0) * 0.5 * (d - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    tz = (fz - z0)[..., None]

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                zi = z0 + dz
                wgt = (
                    (tx if dx else 1.0 - tx)
                    * (ty if dy else 1.0 - ty)
                    * (tz if dz else 1.0 - tz)
                )
                inb = (
                    (xi >= 0) & (xi <= w - 1)
                    & (yi >= 0) & (yi <= h - 1)
                    & (zi >= 0) & (zi <= d - 1)
                )[..., None]
                xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                zi_c = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
                tap = volume[zi_c, yi_c, xi_c]  # (..., C)
                out = out + jnp.where(inb, wgt * tap, 0.0)
    return out


def grid_sample_2d(image, grid):
    """Bilinear 2D variant: image (H, W, C); grid (..., 2) normalized
    (x, y), align_corners=True, zeros padding → (..., C)."""
    h, w, c = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    fx = (gx + 1.0) * 0.5 * (w - 1)
    fy = (gy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
            inb = (
                (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            )[..., None]
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            out = out + jnp.where(inb, wgt * image[yi_c, xi_c], 0.0)
    return out
