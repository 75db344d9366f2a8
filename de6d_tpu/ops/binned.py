"""Spatially binned ball query — exact, shared across MSG scales.

TPU-native acceleration of `ops.ball_query.ball_query` for the
point-model SA layers (reference CUDA path:
/root/reference/core/pcdet/ops/pointnet2/pointnet2_batch/src/
ball_query_gpu.cu ball_query_kernel_fast, :15-51 — the reference
brute-forces all N source points per center; we prune to a 3x3 cell
window first). Produces BIT-IDENTICAL (idx, cnt) to the brute-force
path: the first ``nsample`` in-ball points in ORIGINAL point order,
padded with the first hit (0 when no hit).

Why it is exact
---------------
Points and centers are binned into a 2-D (x, y) grid with
``cell >= r_out`` and indices CLAMPED into the static grid. For any
center c and point p with |p - c| < r:

* both in range: |dx| < r <= cell implies the cell indices differ by
  at most 1 on each axis, so p lies in c's 3x3 window;
* p beyond the grid edge: p clamps into the boundary cell. If c's
  (clamped) cell is within 1 of the boundary the window covers it;
  otherwise c is >= 2 cells ( >= 2r ) away from the edge, so p cannot
  be within r of c in the first place. The symmetric argument covers
  clamped centers. The z axis is not binned, so no argument is needed
  there.

Selection order is exact because candidate ORIGINAL indices are unique
(each point lives in exactly one cell), so ``top_k(-key)`` over
``key = where(in_ball, orig_idx, INT_MAX)`` returns the smallest
``nsample`` original indices — precisely the reference's first-in-
memory-order semantics, independent of bin traversal order.

Design notes (TPU cost model)
-----------------------------
* ONE stable argsort of the per-point cell key serves every scale of
  an MSG layer (the dilated annuli share the outer-radius window).
* The (G, cap, 4) bucket table is built by SCATTER from the N sorted
  rows — cost scales with N (~16k rows), not with G*cap (~1M slots a
  gather-based build would touch; TPU gather/scatter cost scales with
  row count).
* The per-center window fetch gathers 9 CELL rows per center
  (M*9 rows of cap*16 B), not M*K point rows — row count is the TPU
  gather currency (fused-wide-gather lesson, ops/ball_query.py).
* Overflowing cells (population > cap) spill into a global SPILL
  table of ``spill_cap`` rows appended to every window's candidate
  set. Exactness is preserved because a point lives either in its
  cell's first-``cap`` rows or in the spill — never both — so
  candidate original indices stay unique and the top-k select is
  unchanged. Only when the spill itself overflows (returned overflow
  > 0) do callers need the brute fallback; that turns the former
  any-cell-overflow fallback CLIFF (one dense cell used to pay the
  full brute path) into a graceful +spill_cap-column cost.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from . import voxelize as _vox

IMAX = jnp.iinfo(jnp.int32).max


def grid_dims(pc_range, cell: float):
    """Static (Gx, Gy) for a 2-D binning of pc_range at ``cell``."""
    gx = max(1, int(math.ceil((pc_range[3] - pc_range[0]) / cell)))
    gy = max(1, int(math.ceil((pc_range[4] - pc_range[1]) / cell)))
    return gx, gy


@functools.partial(
    jax.jit,
    static_argnames=(
        "radii", "nsamples", "pc_range", "cell_cap", "radius_in_list",
        "center_chunk", "spill_cap",
    ),
)
def binned_msg_query(
    xyz,
    new_xyz,
    radii: tuple,
    nsamples: tuple,
    valid_mask=None,
    new_valid_mask=None,
    radius_in_list: tuple = None,
    pc_range: tuple = None,
    cell_cap: int = 128,
    center_chunk: int = 1024,
    spill_cap: int = 256,
):
    """Ball query for every scale of an MSG layer in one pass.

    Args:
        xyz: (B, N, 3) source points.
        new_xyz: (B, M, 3) query centers.
        radii: per-scale outer radii (static tuple).
        nsamples: per-scale group sizes (static tuple).
        valid_mask / new_valid_mask: optional (B, N) / (B, M) bools.
        radius_in_list: per-scale inner radii (annulus; default 0).
        pc_range: static (x0, y0, z0, x1, y1, z1) binning extent.
        cell_cap: static max points per cell (excess spills).
        center_chunk: centers processed per lax.map step.
        spill_cap: static size of the global spill table appended to
            every window's candidates (0 disables spilling).

    Returns:
        list of (idx (B, M, ns), cnt (B, M)) per scale — bit-identical
        to ops.ball_query.ball_query — and overflow (B,) int32: number
        of points dropped AFTER spilling (0 ==> exact).
    """
    assert pc_range is not None, "binned_msg_query needs a static pc_range"
    if radius_in_list is None:
        radius_in_list = (0.0,) * len(radii)
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), dtype=bool)
    if new_valid_mask is None:
        new_valid_mask = jnp.ones((b, m), dtype=bool)

    cell = float(max(radii))
    gx, gy = grid_dims(pc_range, cell)
    g = gx * gy
    cap = int(cell_cap)
    x0, y0 = float(pc_range[0]), float(pc_range[1])

    def cell_ids(pts):
        cx = jnp.clip(
            jnp.floor((pts[..., 0] - x0) / cell).astype(jnp.int32), 0, gx - 1
        )
        cy = jnp.clip(
            jnp.floor((pts[..., 1] - y0) / cell).astype(jnp.int32), 0, gy - 1
        )
        return cx, cy

    def single(xyz_i, new_xyz_i, valid_i, new_valid_i):
        cx, cy = cell_ids(xyz_i)
        # packed single-uint32 sort when (g, n) fit in 32 bits —
        # same stable semantics, half the sort payload (voxelize.py)
        order, sorted_key = _vox.stable_cell_sort(
            cy * gx + cx, valid_i, g
        )
        # per-cell start offsets in the sorted stream (G+1 searchsorted
        # over a sorted N-vector — one fused binary-search sweep)
        starts = jnp.searchsorted(
            sorted_key, jnp.arange(g + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        rank = jnp.arange(n, dtype=jnp.int32) - starts[
            jnp.clip(sorted_key, 0, g)
        ]
        keep = (sorted_key != IMAX) & (rank < cap)
        spilled = (sorted_key != IMAX) & (rank >= cap)
        n_spill = jnp.sum(spilled.astype(jnp.int32))
        overflow_i = jnp.maximum(n_spill - spill_cap, 0)

        # bucket table: (G*cap + 1, 4) rows of [x, y, z, orig_idx]; the
        # trailing sentinel row (also the drop target) is "no point"
        # dropped rows target g*cap + 1 — OUT of bounds, so mode="drop"
        # discards them (g*cap itself is the in-bounds sentinel row and
        # must stay pristine: it backs every out-of-grid window cell)
        slot = jnp.where(
            keep, jnp.clip(sorted_key, 0, g - 1) * cap + rank, g * cap + 1
        )
        row = jnp.concatenate(
            [xyz_i[order], order[:, None].astype(xyz_i.dtype)], axis=-1
        )
        tbl = jnp.full((g * cap + 1, 4), -1.0, xyz_i.dtype)
        tbl = tbl.at[:, :3].set(1e9)  # far away: never in any ball
        tbl = tbl.at[slot].set(row, mode="drop")
        # global spill table: beyond-cap rows compact into spill_cap
        # slots every window also scans; a point is in its cell's
        # first-cap rows XOR here, so candidate indices stay unique
        if spill_cap > 0:
            spos = jnp.cumsum(spilled.astype(jnp.int32)) - 1
            sslot = jnp.where(spilled & (spos < spill_cap),
                              spos, spill_cap)
            spill_tbl = jnp.full((spill_cap + 1, 4), -1.0, xyz_i.dtype)
            spill_tbl = spill_tbl.at[:, :3].set(1e9)
            spill_tbl = spill_tbl.at[sslot].set(row, mode="drop")
            spill_tbl = spill_tbl[:spill_cap]
        else:
            spill_tbl = None

        # 9-cell windows per center; out-of-grid neighbours hit the
        # sentinel row (duplicating a clamped neighbour would repeat
        # candidates and break the unique-key selection)
        ccx, ccy = cell_ids(new_xyz_i)
        offs = jnp.array(
            [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
            jnp.int32,
        )
        wx = ccx[:, None] + offs[None, :, 1]
        wy = ccy[:, None] + offs[None, :, 0]
        in_grid = (wx >= 0) & (wx < gx) & (wy >= 0) & (wy < gy)
        wcell = jnp.where(in_grid, wy * gx + wx, g)  # (M, 9)

        tbl3 = jnp.concatenate(
            [tbl, jnp.broadcast_to(tbl[-1:], (cap - 1, 4))], axis=0
        ).reshape(g * cap + cap, 4)
        # cell-granular gather: view the table as (G+1, cap, 4) rows
        tbl_cells = tbl3.reshape(g + 1, cap, 4)

        chunk = min(center_chunk, m)
        pad = (-m) % chunk
        wcell_p = jnp.pad(wcell, ((0, pad), (0, 0)), constant_values=g)
        centers_p = jnp.pad(new_xyz_i, ((0, pad), (0, 0)))
        cvalid_p = jnp.pad(new_valid_i, (0, pad))

        def per_chunk(args):
            wc, ctr, cv = args  # (chunk, 9), (chunk, 3), (chunk,)
            cand = tbl_cells[wc]  # (chunk, 9, cap, 4)
            cand = cand.reshape(chunk, 9 * cap, 4)
            if spill_tbl is not None:
                cand = jnp.concatenate(
                    [cand,
                     jnp.broadcast_to(spill_tbl[None],
                                      (chunk, spill_cap, 4))],
                    axis=1,
                )
            # EXACT same fp32 arithmetic as the oracle's
            # _pairwise_sqdist (|c|^2 + |p|^2 - 2 c.p, clamped) — the
            # naive sum((p-c)^2) rounds differently and flips points
            # sitting on the radius boundary
            cxyz = cand[..., :3]
            na = jnp.sum(ctr * ctr, axis=-1)
            nb = jnp.sum(cxyz * cxyz, axis=-1)
            cross = jnp.einsum(
                "kc,knc->kn", ctr, cxyz, precision=jax.lax.Precision.HIGHEST
            )
            d2 = jnp.maximum(na[:, None] + nb - 2.0 * cross, 0.0)
            orig = cand[..., 3].astype(jnp.int32)
            base_ok = (orig >= 0) & cv[:, None]
            outs = []
            for r_out, r_in, ns in zip(radii, radius_in_list, nsamples):
                in_ball = (
                    base_ok
                    & (d2 < r_out * r_out)
                    & (d2 >= r_in * r_in)
                )
                skey = jnp.where(in_ball, orig, IMAX)
                # smallest-ns original indices == reference's first-
                # nsample-in-memory-order (keys are unique)
                top, _ = jax.lax.top_k(-skey, ns)
                sel = -top  # ascending originals, IMAX pads
                cnt = jnp.minimum(
                    jnp.sum(in_ball, axis=-1), ns
                ).astype(jnp.int32)
                fill = jnp.where(cnt > 0, sel[:, 0], 0)
                pos = jnp.arange(ns, dtype=jnp.int32)
                idx = jnp.where(pos[None, :] < cnt[:, None], sel, fill[:, None])
                outs.append((idx.astype(jnp.int32), cnt))
            return tuple(outs)

        res = jax.lax.map(
            per_chunk,
            (
                wcell_p.reshape(-1, chunk, 9),
                centers_p.reshape(-1, chunk, 3),
                cvalid_p.reshape(-1, chunk),
            ),
        )
        flat = []
        for idx, cnt in res:
            flat.append(
                (idx.reshape(-1, idx.shape[-1])[:m], cnt.reshape(-1)[:m])
            )
        return tuple(flat), overflow_i

    per_scale, overflow = jax.vmap(single)(
        xyz, new_xyz, valid_mask, new_valid_mask
    )
    return list(per_scale), overflow


@functools.partial(
    jax.jit, static_argnames=("pc_range", "cell", "cell_cap")
)
def cell_overflow(xyz, valid_mask, pc_range: tuple, cell: float,
                  cell_cap: int):
    """(B,) int32: points beyond ``cell_cap`` in their (clamped) 2-D
    cell — the cheap pre-check the fused SA path conds its brute-force
    fallback on (no table build; one scatter-add over N rows)."""
    gx, gy = grid_dims(pc_range, float(cell))
    x0, y0 = float(pc_range[0]), float(pc_range[1])
    cx = jnp.clip(
        jnp.floor((xyz[..., 0] - x0) / cell).astype(jnp.int32), 0, gx - 1
    )
    cy = jnp.clip(
        jnp.floor((xyz[..., 1] - y0) / cell).astype(jnp.int32), 0, gy - 1
    )
    key = jnp.where(valid_mask, cy * gx + cx, gx * gy)

    def single(k):
        counts = jnp.zeros(gx * gy + 1, jnp.int32).at[k].add(1)
        return jnp.sum(
            jnp.maximum(counts[:-1] - cell_cap, 0)
        )

    return jax.vmap(single)(key)


def _affine_mlp_pool(grouped, cnt, folded, dtype, pool_method: str):
    """Folded (W, b) MLP + masked pool over the group axis (-2).

    grouped slots past ``cnt`` must already replicate the first hit
    (ball-query pad semantics) so avg_pool's pad-inclusive sum matches
    the standard path bit-for-bit in spirit (same math, fold rounding
    aside)."""
    h = grouped.astype(dtype)
    for w, bias in folded:
        h = jax.nn.relu(h @ w.astype(dtype) + bias.astype(dtype))
    ok = (cnt > 0)[..., None]
    if pool_method == "max_pool":
        pooled = jnp.max(h, axis=-2)
    else:
        denom = jnp.maximum(cnt[..., None], 1).astype(jnp.float32)
        pooled = (jnp.sum(h.astype(jnp.float32), axis=-2)
                  / denom).astype(h.dtype)
    return jnp.where(ok, pooled, 0)


def brute_sa_infer(
    xyz, features, new_xyz, folded, valid_mask, new_valid_mask,
    radii: tuple, nsamples: tuple, radius_in_list: tuple,
    use_xyz: bool = True, pool_method: str = "max_pool",
    dtype=jnp.float32,
):
    """Reference-semantics SA inference with the folded-affine MLP —
    the overflow fallback branch of :func:`binned_sa_infer` (pure: no
    flax, so it can live inside lax.cond)."""
    from . import ball_query as bq

    pooled_list, cnt_list = [], []
    for (r, ri, ns), fold in zip(
        zip(radii, radius_in_list, nsamples), folded
    ):
        idx, cnt = bq.ball_query(
            xyz, new_xyz, float(r), int(ns), valid_mask, new_valid_mask,
            radius_in=float(ri),
        )
        grouped = bq.group_with_idx(
            xyz, new_xyz, features, idx, use_xyz=use_xyz
        )
        pooled_list.append(
            _affine_mlp_pool(grouped, cnt, fold, dtype, pool_method)
        )
        cnt_list.append(cnt)
    return tuple(pooled_list), tuple(cnt_list)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radii", "nsamples", "radius_in_list", "pc_range", "cell_cap",
        "center_chunk", "use_xyz", "pool_method", "dtype", "spill_cap",
        "_ablate_select",
    ),
)
def binned_sa_infer(
    xyz, features, new_xyz, folded, valid_mask, new_valid_mask,
    radii: tuple, nsamples: tuple, radius_in_list: tuple,
    pc_range: tuple, cell_cap: int = 128, center_chunk: int = 128,
    use_xyz: bool = True, pool_method: str = "max_pool",
    dtype=jnp.float32, spill_cap: int = 256,
    _ablate_select: bool = False,
):
    """Fused multi-scale SA inference: query + group + MLP + pool per
    center chunk, so the (B, M, ns, C) grouped tensor never reaches
    HBM at full size.

    The candidate table carries ONLY [x, y, z, orig_idx] (like
    binned_msg_query); per chunk: exact d² → first-nsample select
    (identical semantics to binned_msg_query) → feature gather from
    the ORIGINAL (B, N, F) features by selected index — so the wide
    feature columns are fetched for chunk·ns selected rows, not for
    all 9·cap+spill candidates (at SA2 scale F=67: that cut the
    candidate payload ~14× and was the difference between SA2 costing
    more than SA1 and less) — → folded-affine MLP (BN is affine at
    inference, SharedMLP.folded) → masked pool. Beyond-cap points land
    in the global spill table (exact, see module docstring); the
    caller conds on :func:`cell_overflow` ``> spill_cap`` and falls
    back to :func:`brute_sa_infer` only when the spill itself
    overflows.

    Match: the reference's ball_query+group+SharedMLP inference path
    (core/pcdet/ops/pointnet2/pointnet2_batch/pointnet2_modules.py:358-494),
    restructured so the TPU never materializes the grouped tensor.

    Returns (pooled per scale (B, M, Cout_s), cnt per scale (B, M)).
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    if valid_mask is None:
        valid_mask = jnp.ones((b, n), dtype=bool)
    if new_valid_mask is None:
        new_valid_mask = jnp.ones((b, m), dtype=bool)
    d_cols = 4  # [x, y, z, orig_idx] — features fetched post-select

    cell = float(max(radii))
    gx, gy = grid_dims(pc_range, cell)
    g = gx * gy
    cap = int(cell_cap)
    x0, y0 = float(pc_range[0]), float(pc_range[1])

    def cell_ids(pts):
        cx = jnp.clip(
            jnp.floor((pts[..., 0] - x0) / cell).astype(jnp.int32), 0, gx - 1
        )
        cy = jnp.clip(
            jnp.floor((pts[..., 1] - y0) / cell).astype(jnp.int32), 0, gy - 1
        )
        return cx, cy

    def single(xyz_i, feat_i, new_xyz_i, valid_i, new_valid_i):
        cx, cy = cell_ids(xyz_i)
        # packed single-uint32 sort when (g, n) fit in 32 bits —
        # same stable semantics, half the sort payload (voxelize.py)
        order, sorted_key = _vox.stable_cell_sort(
            cy * gx + cx, valid_i, g
        )
        starts = jnp.searchsorted(
            sorted_key, jnp.arange(g + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        rank = jnp.arange(n, dtype=jnp.int32) - starts[
            jnp.clip(sorted_key, 0, g)
        ]
        keep = (sorted_key != IMAX) & (rank < cap)
        spilled = (sorted_key != IMAX) & (rank >= cap)
        slot = jnp.where(
            keep, jnp.clip(sorted_key, 0, g - 1) * cap + rank, g * cap + 1
        )
        row = jnp.concatenate(
            [xyz_i[order], order[:, None].astype(jnp.float32)], axis=-1
        )
        tbl = jnp.zeros((g * cap + 1, d_cols), jnp.float32)
        tbl = tbl.at[:, :3].set(1e9)
        tbl = tbl.at[:, 3].set(-1.0)
        tbl = tbl.at[slot].set(row, mode="drop")
        if spill_cap > 0:
            spos = jnp.cumsum(spilled.astype(jnp.int32)) - 1
            sslot = jnp.where(spilled & (spos < spill_cap),
                              spos, spill_cap)
            spill_tbl = jnp.zeros((spill_cap + 1, d_cols), jnp.float32)
            spill_tbl = spill_tbl.at[:, :3].set(1e9)
            spill_tbl = spill_tbl.at[:, 3].set(-1.0)
            spill_tbl = spill_tbl.at[sslot].set(row, mode="drop")
            spill_tbl = spill_tbl[:spill_cap]
        else:
            spill_tbl = None
        tbl_cells = jnp.concatenate(
            [tbl, jnp.broadcast_to(tbl[-1:], (cap - 1, d_cols))], axis=0
        ).reshape(g + 1, cap, d_cols)

        ccx, ccy = cell_ids(new_xyz_i)
        offs = jnp.array(
            [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
            jnp.int32,
        )
        wx = ccx[:, None] + offs[None, :, 1]
        wy = ccy[:, None] + offs[None, :, 0]
        in_grid = (wx >= 0) & (wx < gx) & (wy >= 0) & (wy < gy)
        wcell = jnp.where(in_grid, wy * gx + wx, g)

        chunk = min(center_chunk, m)
        pad = (-m) % chunk
        wcell_p = jnp.pad(wcell, ((0, pad), (0, 0)), constant_values=g)
        centers_p = jnp.pad(new_xyz_i, ((0, pad), (0, 0)))
        cvalid_p = jnp.pad(new_valid_i, (0, pad))

        def per_chunk(args):
            wc, ctr, cv = args
            cand = tbl_cells[wc].reshape(chunk, 9 * cap, d_cols)
            if spill_tbl is not None:
                cand = jnp.concatenate(
                    [cand,
                     jnp.broadcast_to(spill_tbl[None],
                                      (chunk, spill_cap, d_cols))],
                    axis=1,
                )
            cxyz = cand[..., :3]
            na = jnp.sum(ctr * ctr, axis=-1)
            nb = jnp.sum(cxyz * cxyz, axis=-1)
            cross = jnp.einsum(
                "kc,knc->kn", ctr, cxyz, precision=jax.lax.Precision.HIGHEST
            )
            d2 = jnp.maximum(na[:, None] + nb - 2.0 * cross, 0.0)
            orig = cand[..., 3].astype(jnp.int32)
            base_ok = (orig >= 0) & cv[:, None]
            outs = []
            for (r_out, r_in, ns), fold in zip(
                zip(radii, radius_in_list, nsamples), folded
            ):
                in_ball = (
                    base_ok & (d2 < r_out * r_out) & (d2 >= r_in * r_in)
                )
                skey = jnp.where(in_ball, orig, IMAX)
                if _ablate_select:
                    # WRONG-result probe branch (sa_probe cost
                    # attribution): skip the exact top_k select
                    pos = jnp.broadcast_to(
                        jnp.arange(ns, dtype=jnp.int32)[None],
                        (chunk, ns),
                    )
                else:
                    _, pos = jax.lax.top_k(-skey, ns)  # candidate positions
                cnt = jnp.minimum(
                    jnp.sum(in_ball, axis=-1), ns
                ).astype(jnp.int32)
                slot_ids = jnp.arange(ns, dtype=jnp.int32)
                # pad slots replicate the first hit (reference pad
                # semantics; keeps avg_pool's pad-inclusive sum exact)
                pos_f = jnp.where(
                    slot_ids[None, :] < jnp.maximum(cnt, 1)[:, None],
                    pos, pos[:, :1],
                )
                sel = jnp.take_along_axis(
                    cand, pos_f[..., None], axis=1
                )  # (chunk, ns, 4)
                parts = []
                if use_xyz:
                    parts.append(sel[..., :3] - ctr[:, None, :])
                if feat_i is not None:
                    # fetch wide feature rows ONLY for the selected
                    # points (orig_idx -1 = sentinel: clamp to row 0 —
                    # that slot only occurs at cnt==0, whose pooled
                    # output the ok-mask zeroes anyway)
                    oidx = jnp.clip(
                        sel[..., 3].astype(jnp.int32), 0, n - 1
                    )
                    parts.append(jnp.take(feat_i, oidx, axis=0))
                grouped = (
                    parts[0] if len(parts) == 1
                    else jnp.concatenate(parts, axis=-1)
                )
                outs.append(
                    (_affine_mlp_pool(grouped, cnt, fold, dtype,
                                      pool_method), cnt)
                )
            return tuple(outs)

        res = jax.lax.map(
            per_chunk,
            (
                wcell_p.reshape(-1, chunk, 9),
                centers_p.reshape(-1, chunk, 3),
                cvalid_p.reshape(-1, chunk),
            ),
        )
        out = []
        for pooled, cnt in res:
            out.append(
                (pooled.reshape(-1, pooled.shape[-1])[:m],
                 cnt.reshape(-1)[:m])
            )
        return tuple(out)

    per_scale = jax.vmap(
        single, in_axes=(0, None if features is None else 0, 0, 0, 0)
    )(xyz, features, new_xyz, valid_mask, new_valid_mask)
    pooled_list = tuple(p for p, _ in per_scale)
    cnt_list = tuple(c for _, c in per_scale)
    return pooled_list, cnt_list
