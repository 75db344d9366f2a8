"""Pallas TPU kernel: pairwise rotated-IoU suppression mask for NMS.

Computes mask[i, j] = (IoU_bev(box_i, box_j) > thresh) for the NMS
candidate set, tiled (BR, BC) over the pair grid. The Green's/Liang-
Barsky overlap (see ops/iou3d.py) is fully unrolled inside the kernel
so the ~50 intermediates per pair live in vector registers instead of
HBM — this is the hot O(K²) stage of NMS (reference analog: the
64-bit-bitmask CUDA `nms_kernel`, iou3d_nms_kernel.cu:267).

Tile skipping (v2):
- candidates arrive score-sorted, so the invalid ones (below
  SCORE_THRESH / past the per-sample candidate count) form a suffix.
  The valid count is scalar-prefetched and tiles entirely inside the
  invalid suffix write zeros without computing — on trained models only
  a few hundred candidates survive the score gate, making the mask
  cost quadratic in the *real* candidate count, not the static buffer.
- greedy NMS only consumes the strict upper triangle (suppressor index
  < suppressed index), so tiles entirely below the block diagonal are
  skipped too (~2x on the worst case).

Falls back to the XLA path automatically off-TPU (interpret mode in
tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _make_mask_kernel(thresh: float, block_r: int, block_c: int):
    def _mask_kernel(count_ref, rows_ref, cols_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        count = count_ref[0]
        row0 = i * block_r
        col0 = j * block_c
        needed = (
            (row0 < count)
            & (col0 < count)
            # strict upper triangle: tile holds some pair with row < col
            & (row0 < col0 + block_c - 1)
        )

        @pl.when(needed)
        def _compute():
            rows = rows_ref[:]  # (16, BR) — row-side packed coords
            cols = cols_ref[:]  # (16, BC)
            rx = [rows[i, :][:, None] for i in range(4)]
            ry = [rows[4 + i, :][:, None] for i in range(4)]
            cx = [cols[i, :][None, :] for i in range(4)]
            cy = [cols[4 + i, :][None, :] for i in range(4)]
            overlap = _green_tile(rx, ry, cx, cy)
            area_r = rows[8, :][:, None]
            area_c = cols[8, :][None, :]
            union = jnp.maximum(area_r + area_c - overlap, EPS)
            iou = overlap / union
            out_ref[:] = (iou > thresh).astype(jnp.float32)

        @pl.when(jnp.logical_not(needed))
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    return _mask_kernel


def _green_tile(rx, ry, cx, cy):
    def green_pass(px, py, qx, qy, eps_b):
        total = None
        for e in range(4):
            p0x, p0y = px[e], py[e]
            dx = px[(e + 1) % 4] - p0x
            dy = py[(e + 1) % 4] - p0y
            t0 = None
            t1 = None
            for c in range(4):
                a0x, a0y = qx[c], qy[c]
                ex = qx[(c + 1) % 4] - a0x
                ey = qy[(c + 1) % 4] - a0y
                f0 = -(ex * (p0y - a0y) - ey * (p0x - a0x)) - eps_b
                fd = -(ex * dy - ey * dx)
                small = jnp.abs(fd) < EPS
                denom = jnp.where(small, jnp.where(fd >= 0, EPS, -EPS), fd)
                t_cross = -f0 / denom
                lo = jnp.where(fd > 0, t_cross, 0.0)
                hi = jnp.where(fd < 0, t_cross, 1.0)
                infeasible = small & (f0 < -EPS)
                lo = jnp.where(infeasible, 1.0, lo)
                hi = jnp.where(infeasible, 0.0, hi)
                t0 = lo if t0 is None else jnp.maximum(t0, lo)
                t1 = hi if t1 is None else jnp.minimum(t1, hi)
            t0 = jnp.clip(t0, 0.0, 1.0)
            t1 = jnp.maximum(t0, jnp.clip(t1, 0.0, 1.0))
            q0x = p0x + t0 * dx
            q0y = p0y + t0 * dy
            q1x = p0x + t1 * dx
            q1y = p0y + t1 * dy
            contrib = 0.5 * (q0x * q1y - q0y * q1x)
            total = contrib if total is None else total + contrib
        return total

    area = green_pass(rx, ry, cx, cy, 0.0) + green_pass(
        cx, cy, rx, ry, 1e-5
    )
    return jnp.abs(area)


def _pack(boxes):
    """(K, 7+) → (16, K) packed rows [cx(4); cy(4); area; pad] — the
    point dim rides the 128-lane axis."""
    from ..geometry import boxes_to_corners_bev

    corners = boxes_to_corners_bev(boxes)  # (K, 4, 2)
    area = boxes[:, 3] * boxes[:, 4]
    k = boxes.shape[0]
    packed = jnp.zeros((16, k), jnp.float32)
    packed = packed.at[0:4, :].set(corners[:, :, 0].T)
    packed = packed.at[4:8, :].set(corners[:, :, 1].T)
    packed = packed.at[8, :].set(area)
    return packed


@functools.partial(
    jax.jit, static_argnames=("thresh", "block_r", "block_c", "interpret")
)
def nms_suppression_mask(boxes, thresh: float, valid_count=None,
                         block_r: int = 128, block_c: int = 256,
                         interpret: bool = False):
    """(K, 7+) boxes → (K, K) float32 0/1 mask of IoU>thresh pairs.

    boxes must be score-sorted with invalid candidates as a suffix;
    `valid_count` (traced int32 scalar, default K) lets tiles past the
    valid region skip compute. Entries at/below the diagonal in skipped
    lower-triangle tiles are zero (NMS applies triu anyway).
    """
    k = boxes.shape[0]
    block_r = min(block_r, k)
    block_c = min(block_c, k)
    packed = _pack(boxes)
    if valid_count is None:
        valid_count = k
    count = jnp.asarray(valid_count, jnp.int32).reshape((1,))

    grid = (pl.cdiv(k, block_r), pl.cdiv(k, block_c))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (16, block_r), lambda i, j, c: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16, block_c), lambda i, j, c: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_r, block_c), lambda i, j, c: (i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _make_mask_kernel(float(thresh), block_r, block_c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
        interpret=interpret,
    )(count, packed, packed)
