"""Ground-aware / sectorized sampling strategies — vectorized XLA.

Parity targets (reference pointnet2_stack/pointnet2_utils.py):
- sectorized_farthest_point_sampling (:408-451): polar-sector split +
  per-sector FPS (PV-RCNN++ trick).
- ground_aware_farthest_point_sampling (:259-297, g-fps): numba PCA
  ground segmentation per 2×2 m patch (two near-horizontal principal
  axes + eigenvalue ratio test) → FPS over non-ground points only.
- gd_farthest_point_sampling (:300-323, gd-fps): probabilistic
  sampling with prob ∝ (53 − density)·(fg + 1).
- dense_aware_point_sampling (:326-379, daps): inverse-density
  sampling over cylindrical range bins.

TPU design: the per-patch PCA is a batched 3×3 eigendecomposition over
a fixed grid (segment-sum covariance → jnp.linalg.eigh), replacing the
reference's host-side numba loops; probabilistic sampling uses Gumbel
top-k (weighted sampling without replacement) with an explicit PRNG
key. Sector split uses a STATIC equal npoint/num_sectors share per
sector (the reference splits proportionally to dynamic sector counts,
which is not shape-stable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops import sampling

GRID_CELL = 2.0  # meters (reference voxel_size=[2, 2])
MAX_CELLS = 4096


def _cell_ids(xyz, valid):
    """(N, 3) → (N,) linear 2x2 m cell ids (invalid → MAX_CELLS-1)."""
    cell = jnp.floor(xyz[:, :2] / GRID_CELL).astype(jnp.int32) + 64
    cell = jnp.clip(cell, 0, 127)
    ids = cell[:, 0] * 128 + cell[:, 1]
    ids = jnp.clip(ids, 0, MAX_CELLS - 1)
    return jnp.where(valid, ids, MAX_CELLS - 1)


def ground_segmentation(xyz, valid):
    """Per-point ground flag via per-cell PCA (reference `analysis`,
    pointnet2_utils.py:208-230).

    Ground cell: ≥3 points, two dominant principal axes nearly
    horizontal (|sin ∠(v, z)| > 0.8) and planar spread
    (s1/s2 > 5 ⇔ λ1/λ2 > 25).
    Returns (point_is_ground (N,), cell_count_per_point (N,)).
    """
    n = xyz.shape[0]
    ids = _cell_ids(xyz, valid)
    ones = valid.astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, ids, MAX_CELLS)
    mean = jax.ops.segment_sum(
        jnp.where(valid[:, None], xyz, 0.0), ids, MAX_CELLS
    ) / jnp.maximum(cnt[:, None], 1.0)
    centered = xyz - mean[ids]
    outer = centered[:, :, None] * centered[:, None, :]
    cov = jax.ops.segment_sum(
        jnp.where(valid[:, None, None], outer, 0.0), ids, MAX_CELLS
    ) / jnp.maximum(cnt[:, None, None], 1.0)
    # guard degenerate cells for eigh stability
    cov = cov + jnp.eye(3) * 1e-8
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    # descending order: v0 = largest
    lam0, lam1, lam2 = eigvals[:, 2], eigvals[:, 1], eigvals[:, 0]
    v0, v1 = eigvecs[:, :, 2], eigvecs[:, :, 1]
    horiz0 = jnp.sqrt(
        jnp.maximum(1.0 - v0[:, 2] ** 2, 0.0)
    ) > 0.8
    horiz1 = jnp.sqrt(jnp.maximum(1.0 - v1[:, 2] ** 2, 0.0)) > 0.8
    planar = lam1 / (lam2 + 1e-12) > 25.0
    cell_ground = (cnt > 2) & horiz0 & horiz1 & planar
    return cell_ground[ids] & valid, cnt[ids]


@functools.partial(jax.jit, static_argnames=("npoint",))
def ground_aware_farthest_point_sample(xyz, npoint: int, valid=None):
    """g-fps: FPS restricted to non-ground points. (B, N, 3) → (B, np)."""
    b, n, _ = xyz.shape
    if valid is None:
        valid = jnp.ones((b, n), bool)

    def single(x, v):
        ground, _ = ground_segmentation(x, v)
        return ground

    ground = jax.vmap(single)(xyz, valid)
    return sampling.farthest_point_sample(xyz, npoint, valid & ~ground)


@functools.partial(jax.jit, static_argnames=("npoint",))
def gd_farthest_point_sample(xyz, npoint: int, valid=None, rng=None):
    """gd-fps: weighted sampling, prob ∝ (53 − density)·(fg + 1)
    (reference :300-323). Gumbel top-k ≙ choice without replacement."""
    b, n, _ = xyz.shape
    if valid is None:
        valid = jnp.ones((b, n), bool)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    def single(x, v, key):
        ground, cnt = ground_segmentation(x, v)
        fg = (~ground).astype(jnp.float32)
        w = jnp.maximum(53.0 - cnt, 1.0) * (fg + 1.0)
        w = jnp.where(v, w, 1e-12)
        g = jax.random.gumbel(key, (n,))
        keys = jnp.log(w) + g
        _, idx = jax.lax.top_k(keys, npoint)
        return idx.astype(jnp.int32)

    keys = jax.random.split(rng, b)
    return jax.vmap(single)(xyz, valid, keys)


@functools.partial(jax.jit, static_argnames=("npoint",))
def density_aware_point_sample(xyz, npoint: int, valid=None, rng=None):
    """daps: inverse-density sampling over cylindrical range bins
    (reference :326-379)."""
    b, n, _ = xyz.shape
    if valid is None:
        valid = jnp.ones((b, n), bool)
    rng = jax.random.PRNGKey(0) if rng is None else rng
    num_bins = 40

    def single(x, v, key):
        r = jnp.linalg.norm(x[:, :2], axis=-1)
        bin_id = jnp.clip((r / 2.0).astype(jnp.int32), 0, num_bins - 1)
        bin_id = jnp.where(v, bin_id, num_bins)
        cnt = jax.ops.segment_sum(
            v.astype(jnp.float32), bin_id, num_bins + 1
        )
        w = 1.0 / jnp.maximum(cnt[bin_id], 1.0)
        w = jnp.where(v, w, 1e-12)
        g = jax.random.gumbel(key, (n,))
        _, idx = jax.lax.top_k(jnp.log(w) + g, npoint)
        return idx.astype(jnp.int32)

    keys = jax.random.split(rng, b)
    return jax.vmap(single)(xyz, valid, keys)


@functools.partial(jax.jit, static_argnames=("npoint", "num_sectors"))
def sectorized_farthest_point_sample(xyz, npoint: int, valid=None,
                                     num_sectors: int = 6):
    """Polar-sector FPS: azimuth split into num_sectors, masked FPS per
    sector with an equal npoint share, concat (static-share deviation
    from the reference's proportional split — see module docstring)."""
    b, n, _ = xyz.shape
    if valid is None:
        valid = jnp.ones((b, n), bool)
    per = npoint // num_sectors
    counts = [per] * num_sectors
    counts[-1] += npoint - per * num_sectors

    azimuth = jnp.arctan2(xyz[..., 1], xyz[..., 0])  # (B, N)
    sector = (
        (azimuth + jnp.pi) / (2 * jnp.pi) * num_sectors
    ).astype(jnp.int32)
    sector = jnp.clip(sector, 0, num_sectors - 1)

    idx_list = []
    for s in range(num_sectors):
        mask = valid & (sector == s)
        # fall back to any valid point when a sector is empty
        mask = jnp.where(
            jnp.any(mask, axis=1, keepdims=True), mask, valid
        )
        idx_list.append(
            sampling.farthest_point_sample(xyz, counts[s], mask)
        )
    return jnp.concatenate(idx_list, axis=-1)
