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
* Overflowing cells (population > cap) would silently break parity,
  so the op returns the overflow count; callers assert/monitor it and
  cap defaults carry headroom.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

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
        "center_chunk",
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
        cell_cap: static max points per cell (overflow reported).
        center_chunk: centers processed per lax.map step.

    Returns:
        list of (idx (B, M, ns), cnt (B, M)) per scale — bit-identical
        to ops.ball_query.ball_query — and overflow (B,) int32: number
        of points dropped from candidate tables (0 ==> exact).
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
        key = jnp.where(valid_i, cy * gx + cx, IMAX)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        sorted_key = key[order]
        # per-cell start offsets in the sorted stream (G+1 searchsorted
        # over a sorted N-vector — one fused binary-search sweep)
        starts = jnp.searchsorted(
            sorted_key, jnp.arange(g + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        rank = jnp.arange(n, dtype=jnp.int32) - starts[
            jnp.clip(sorted_key, 0, g)
        ]
        keep = (sorted_key != IMAX) & (rank < cap)
        overflow_i = jnp.sum(
            ((sorted_key != IMAX) & (rank >= cap)).astype(jnp.int32)
        )

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
