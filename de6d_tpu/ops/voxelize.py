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


def packed_sort_bits(n_cells: int, n: int):
    """Static bit budget for packing (cell_key, point_idx) into one
    uint32: returns (key_bits_unused, idx_bits) or None when they
    don't fit. Sentinel key = n_cells (sorts after every valid key)."""
    idx_bits = max(1, (n - 1).bit_length())
    key_bits = max(1, int(n_cells).bit_length())
    if key_bits + idx_bits > 32:
        return None
    return key_bits, idx_bits


def stable_cell_sort(key, ok, n_cells: int):
    """Stable (order, sorted_keys) for int32 cell keys in [0, n_cells)
    with BIG as the invalid sentinel. When the static cell count and N
    fit in 32 bits together, sorts ONE packed uint32 array (key in the
    high bits, point index in the low bits — stability from the index
    tie-break) instead of argsort's (key, iota) two-array comparator
    sort: half the payload, measurably faster on TPU where the bitonic
    sort cost scales with payload width. Falls back to stable argsort
    otherwise."""
    n = key.shape[0]
    bits = packed_sort_bits(n_cells, n)
    if bits is None:
        key = jnp.where(ok, key, BIG)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        return order, key[order]
    _, idx_bits = bits
    sent = jnp.uint32(n_cells)
    k32 = jnp.where(ok, key.astype(jnp.uint32), sent)
    packed = (k32 << idx_bits) | jnp.arange(n, dtype=jnp.uint32)
    packed = jax.lax.sort(packed)
    order = (packed & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    sk = (packed >> idx_bits).astype(jnp.int32)
    sorted_keys = jnp.where(sk == n_cells, BIG, sk)
    return order, sorted_keys


def _stable_key_sort(key, ok, pc_range, voxel_size):
    """stable_cell_sort with the cell count derived from the static
    grid geometry."""
    import numpy as _np

    lo = _np.asarray(pc_range[0:3], _np.float64)
    hi = _np.asarray(pc_range[3:6], _np.float64)
    vs = _np.asarray(voxel_size, _np.float64)
    grid = _np.floor((hi - lo) / vs + 0.5).astype(_np.int64)
    return stable_cell_sort(key, ok, int(grid[0] * grid[1] * grid[2]))


def voxelize(
    points,
    valid_mask,
    pc_range,
    voxel_size,
    max_voxels: int,
    max_points_per_voxel: int,
):
    """List-friendly wrapper: grid geometry must be static (see
    :func:`_voxelize`); converts pc_range / voxel_size to hashable
    tuples so call sites may keep passing python lists."""
    return _voxelize(
        points, valid_mask,
        tuple(float(x) for x in pc_range),
        tuple(float(x) for x in voxel_size),
        max_voxels, max_points_per_voxel,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "pc_range", "voxel_size", "max_voxels", "max_points_per_voxel",
    ),
)
def _voxelize(
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
        pc_range / voxel_size: static python tuples (grid geometry is
            config-time constant; static lets the key sort pack cell
            key + point index into ONE uint32 when they fit — half the
            sort payload of argsort's (key, iota) pair, stability free
            from the index tie-break).
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

    # single-sort pipeline: one sort yields (a) the unique key list,
    # (b) every point's voxel slot, and (c) the per-voxel start offsets
    # in the sorted order. The (V, P, C) buffers are then built with
    # GATHERS from the sorted points (voxel v's points are contiguous at
    # [starts[v], starts[v+1])) — TPU scatters serialize, gathers don't;
    # only small (N,)→(V,) int32 scatters remain.
    order, sorted_keys = _stable_key_sort(key, ok, pc_range, voxel_size)
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [sorted_keys[:1] != BIG, sorted_keys[1:] != sorted_keys[:-1]]
    ) & (sorted_keys != BIG)
    slot_sorted = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # dense id
    # scatter slot back to point order (small int32 scatter)
    slot = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)

    num_voxels = jnp.minimum(
        jnp.sum(is_start), v
    ).astype(jnp.int32)
    slot_or_drop = jnp.where(is_start, slot_sorted, v)
    uniq = jnp.full((v,), BIG, jnp.int32)
    uniq = uniq.at[slot_or_drop].set(
        jnp.where(is_start, sorted_keys, BIG), mode="drop"
    )

    n_valid = jnp.sum(ok.astype(jnp.int32))
    # starts_ext[s] = sorted-order position where voxel s begins; index
    # v itself takes the first OVERFLOWED voxel's start (if any) so the
    # last kept voxel's count closes correctly. Only start entries may
    # write (slot ids are unique); everything else drops out of bounds.
    starts_ext = jnp.full((v + 1,), n_valid, jnp.int32)
    starts_ext = starts_ext.at[
        jnp.where(is_start, slot_sorted, v + 1)
    ].set(pos, mode="drop")
    # tail slots past num_voxels keep n_valid so their counts diff to 0
    # (dense slot ids are contiguous in sorted-key order)
    starts = starts_ext[:v]
    next_start = starts_ext[1:]
    full_counts = jnp.clip(next_start - starts, 0, None)
    counts = jnp.minimum(full_counts, p)

    pts_sorted = points[order]
    gather_idx = jnp.clip(
        starts[:, None] + jnp.arange(p, dtype=jnp.int32)[None, :], 0, n - 1
    )  # (V, P)
    in_voxel = jnp.arange(p, dtype=jnp.int32)[None, :] < counts[:, None]
    voxels = jnp.where(
        in_voxel[..., None], pts_sorted[gather_idx], 0.0
    ).astype(points.dtype)

    slot_ok = ok & (slot >= 0) & (slot < v)

    # decode coords (z, y, x) from unique keys
    k = uniq
    kz = k // (grid[1] * grid[0])
    rem = k - kz * grid[1] * grid[0]
    ky = rem // grid[0]
    kx = rem - ky * grid[0]
    coords = jnp.stack([kz, ky, kx], axis=-1).astype(jnp.int32)
    coords = jnp.where(k[:, None] != BIG, coords, -1)

    point_voxel_idx = jnp.where(slot_ok, slot, -1).astype(jnp.int32)
    # sorted-order metadata for fused consumers (PillarVFE fast path,
    # dynamic VFEs): lets them run segmented reductions over the sorted
    # point stream with gathers/scans only — unused keys are DCE'd.
    rank_sorted = pos - starts[jnp.clip(slot_sorted, 0, v - 1)]
    sorted_valid = (sorted_keys != BIG) & (slot_sorted >= 0) & (
        slot_sorted < v
    )
    return {
        "voxels": voxels,
        "voxel_coords": coords,
        "voxel_num_points": counts,
        "num_voxels": num_voxels,
        "point_voxel_idx": point_voxel_idx,
        "order": order.astype(jnp.int32),
        "sorted_slot": jnp.where(sorted_valid, slot_sorted, -1),
        "sorted_rank": rank_sorted.astype(jnp.int32),
        "voxel_starts": starts,
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


def _segmented_prefix(values, ids, op, identity, window):
    """Hillis-Steele segmented inclusive prefix with CONTIGUOUS shifts.

    After ceil(log2(window)) doubling passes, row i holds op over the
    last min(i - seg_start + 1, 2**passes) rows of its segment — exact
    for every row whose within-segment depth is <= window. Callers only
    read capped segment ends (depth <= window), so this suffices and
    avoids both scatters and jax.lax.associative_scan (whose odd/even
    decomposition lowers to strided slices that crawl on TPU).
    """
    import numpy as _np

    n = values.shape[0]
    x = values
    passes = max(1, int(_np.ceil(_np.log2(max(2, window)))))
    for k in range(passes):
        sh = 1 << k
        if sh >= n:
            break
        pad_v = jnp.full((sh,) + x.shape[1:], identity, x.dtype)
        x_sh = jnp.concatenate([pad_v, x[:-sh]], axis=0)
        ids_sh = jnp.concatenate(
            [jnp.full((sh,), -1, ids.dtype), ids[:-sh]], axis=0
        )
        same = (ids_sh == ids)[..., None]
        x = jnp.where(same, op(x, x_sh), x)
    return x


def sorted_segment_sum(values, ids, starts, counts, window=32):
    """Segment sums over a SORTED id stream — shifted-doubling prefix
    + gather at capped segment ends; no scatter, exact per segment
    (each sum covers <=window members; a global cumsum-diff would lose
    ~ulp(running total) to cancellation).

    values: (N, C); ids: (N,) contiguous segment ids (-1 tail ok);
    segment v's capped window is [starts[v], starts[v]+counts[v]),
    counts <= window (static).
    """
    n = values.shape[0]
    scanned = _segmented_prefix(values, ids, jnp.add, 0.0, window)
    ends = jnp.clip(starts + counts - 1, 0, n - 1)
    out = scanned[ends]
    return jnp.where((counts > 0)[:, None], out, 0.0)


def sorted_segment_max(values, ids, starts, counts, fill=0.0, window=32):
    """Segmented max over a SORTED id stream — shifted-doubling prefix
    + gather at capped segment ends; no scatter. Empty segments return
    ``fill``. counts must be <= window (static)."""
    n = values.shape[0]
    neg = jnp.asarray(jnp.finfo(values.dtype).min, values.dtype)
    scanned = _segmented_prefix(values, ids, jnp.maximum, neg, window)
    ends = jnp.clip(starts + counts - 1, 0, n - 1)
    out = scanned[ends]
    return jnp.where((counts > 0)[:, None], out, fill)


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
