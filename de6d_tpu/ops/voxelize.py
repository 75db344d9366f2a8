"""Fixed-shape dynamic voxelization + scatter helpers (pure XLA).

TPU-native replacement for the reference's spconv
VoxelGeneratorV2/Point2VoxelCPU3d wrapper
(/root/reference/core/pcdet/datasets/processor/data_processor.py:15-60)
and the torch_scatter-based dynamic VFEs
(models/backbones_3d/vfe/dynamic_{mean,pillar}_vfe.py).

Everything is shape-stable under jit: voxel buffers carry MAX_VOXELS
slots + a validity count, points carry a (N,) → voxel-slot map with -1
for dropped points. Voxel order is sorted-by-linear-key rather than
the reference's first-appearance order — downstream consumers (scatter
to BEV canvas, per-voxel reductions) are order-invariant; only the
overflow policy differs when num_voxels > MAX_VOXELS (we drop the
largest keys instead of the latest arrivals).

Coordinate convention matches spconv: voxel_coords are (z, y, x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = jnp.iinfo(jnp.int32).max


def compute_voxel_coords(points, pc_range, voxel_size):
    """(N, 3+) points → (N, 3) int32 (x, y, z) cell indices + in-range
    mask. pc_range: [x0, y0, z0, x1, y1, z1]."""
    lo = jnp.asarray(pc_range[0:3], dtype=points.dtype)
    hi = jnp.asarray(pc_range[3:6], dtype=points.dtype)
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    xyz = points[:, :3]
    ijk = jnp.floor((xyz - lo) / vs).astype(jnp.int32)
    grid = jnp.floor((hi - lo) / vs + 0.5).astype(jnp.int32)
    in_range = jnp.all((ijk >= 0) & (ijk < grid), axis=-1)
    return ijk, in_range


def _segment_ranks(keys):
    """Per-element rank within its key group, following array order.
    keys must already place invalid entries at BIG."""
    n = keys.shape[0]
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, -1)
    )
    rank_sorted = pos - group_start
    rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)
    return rank


@functools.partial(
    jax.jit, static_argnames=("max_voxels", "max_points_per_voxel")
)
def voxelize(
    points,
    valid_mask,
    pc_range,
    voxel_size,
    max_voxels: int,
    max_points_per_voxel: int,
):
    """Hard voxelization with fixed-size buffers.

    Args:
        points: (N, 3+C) — xyz + features.
        valid_mask: (N,) bool.
        pc_range / voxel_size: python lists (static) or arrays.
        max_voxels, max_points_per_voxel: static capacities.

    Returns dict:
        voxels: (V, P, 3+C) per-voxel point buffers (zero padded),
        voxel_coords: (V, 3) int32 (z, y, x), -1 for empty slots,
        voxel_num_points: (V,) int32,
        num_voxels: () int32,
        point_voxel_idx: (N,) int32 voxel slot per point (-1 = dropped).
    """
    n = points.shape[0]
    v, p = max_voxels, max_points_per_voxel
    lo = jnp.asarray(pc_range[0:3], dtype=points.dtype)
    hi = jnp.asarray(pc_range[3:6], dtype=points.dtype)
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    grid = jnp.floor((hi - lo) / vs + 0.5).astype(jnp.int32)  # (nx, ny, nz)

    ijk, in_range = compute_voxel_coords(points, pc_range, voxel_size)
    ok = in_range & valid_mask
    # linear key in (z, y, x) raster order
    key = (ijk[:, 2] * grid[1] + ijk[:, 1]) * grid[0] + ijk[:, 0]
    key = jnp.where(ok, key, BIG)

    # single-sort pipeline: one argsort yields (a) the unique key list,
    # (b) every point's voxel slot, and (c) its within-voxel arrival
    # rank — replacing the unique+searchsorted+argsort triple (3 sorts)
    order = jnp.argsort(key, stable=True)
    sorted_keys = key[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [sorted_keys[:1] != BIG, sorted_keys[1:] != sorted_keys[:-1]]
    ) & (sorted_keys != BIG)
    slot_sorted = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # dense id
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, -1)
    )
    rank_sorted = pos - group_start
    # scatter back to point order
    slot = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    num_voxels = jnp.minimum(
        jnp.sum(is_start), v
    ).astype(jnp.int32)
    uniq = jnp.full((v,), BIG, jnp.int32)
    uniq = uniq.at[
        jnp.where(is_start, slot_sorted, v)
    ].set(jnp.where(is_start, sorted_keys, BIG), mode="drop")

    slot_ok = ok & (slot >= 0) & (slot < v)
    keep = slot_ok & (rank < p)

    slot_w = jnp.where(keep, slot, v)
    rank_w = jnp.where(keep, rank, 0)
    voxels = jnp.zeros((v + 1, p, points.shape[1]), dtype=points.dtype)
    voxels = voxels.at[slot_w, rank_w].set(points)[:v]

    counts = jnp.zeros((v + 1,), jnp.int32).at[slot_w].add(
        keep.astype(jnp.int32)
    )[:v]

    # decode coords (z, y, x) from unique keys
    k = uniq
    kz = k // (grid[1] * grid[0])
    rem = k - kz * grid[1] * grid[0]
    ky = rem // grid[0]
    kx = rem - ky * grid[0]
    coords = jnp.stack([kz, ky, kx], axis=-1).astype(jnp.int32)
    coords = jnp.where(k[:, None] != BIG, coords, -1)

    point_voxel_idx = jnp.where(slot_ok, slot, -1).astype(jnp.int32)
    return {
        "voxels": voxels,
        "voxel_coords": coords,
        "voxel_num_points": counts,
        "num_voxels": num_voxels,
        "point_voxel_idx": point_voxel_idx,
    }


def scatter_to_bev(pillar_features, coords, nx: int, ny: int):
    """(V, C) pillar features + (V, 3) (z,y,x) coords → (C, ny, nx)
    dense canvas. Parity: PointPillarScatter
    (map_to_bev/pointpillar_scatter.py:14-37); empty slots (coords -1)
    land in a trash row."""
    c = pillar_features.shape[1]
    valid = coords[:, 0] >= 0
    lin = jnp.where(valid, coords[:, 1] * nx + coords[:, 2], ny * nx)
    canvas = jnp.zeros((ny * nx + 1, c), dtype=pillar_features.dtype)
    canvas = canvas.at[lin].set(
        jnp.where(valid[:, None], pillar_features, 0.0)
    )
    return canvas[: ny * nx].T.reshape(c, ny, nx)


def segment_mean(values, segment_ids, num_segments: int, valid=None):
    """Masked segment mean; invalid rows go to a trash segment."""
    if valid is None:
        valid = segment_ids >= 0
    ids = jnp.where(valid, segment_ids, num_segments)
    total = jax.ops.segment_sum(
        jnp.where(valid[..., None], values, 0.0), ids, num_segments + 1
    )[:num_segments]
    cnt = jax.ops.segment_sum(
        valid.astype(values.dtype), ids, num_segments + 1
    )[:num_segments]
    return total / jnp.maximum(cnt[:, None], 1.0), cnt


def segment_max(values, segment_ids, num_segments: int, valid=None):
    """Masked segment max (0 for empty segments after the relu-style
    floor used by the PFN — caller decides)."""
    if valid is None:
        valid = segment_ids >= 0
    ids = jnp.where(valid, segment_ids, num_segments)
    neg = jnp.finfo(values.dtype).min
    vals = jnp.where(valid[..., None], values, neg)
    out = jax.ops.segment_max(vals, ids, num_segments + 1)[:num_segments]
    return jnp.where(jnp.isfinite(out), out, 0.0)
