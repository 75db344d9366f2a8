"""Pallas TPU kernel: pairwise rotated-IoU suppression mask for NMS.

Computes mask[i, j] = (IoU_bev(box_i, box_j) > thresh) for the NMS
candidate set, tiled (BR, BC) over the pair grid. The Green's/Liang-
Barsky overlap (see ops/iou3d.py) is fully unrolled inside the kernel
so the ~50 intermediates per pair live in vector registers instead of
HBM — this is the hot O(K²) stage of NMS (reference analog: the
64-bit-bitmask CUDA `nms_kernel`, iou3d_nms_kernel.cu:267).

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


def _overlap_tile(rows, cols):
    """rows: (BR, 10) [4x corner x, 4x corner y(interleaved), area...];
    layout: rows[:, 0:4] corner x, rows[:, 4:8] corner y, rows[:, 8]
    area. cols likewise. Returns (BR, BC) overlap area."""
    br = rows.shape[0]
    bc = cols.shape[0]

    rx = [rows[:, i][:, None] for i in range(4)]
    ry = [rows[:, 4 + i][:, None] for i in range(4)]
    cx = [cols[:, i][None, :] for i in range(4)]
    cy = [cols[:, 4 + i][None, :] for i in range(4)]

    def green_pass(px, py, qx, qy, eps_b):
        total = jnp.zeros((br, bc), jnp.float32)
        for e in range(4):
            p0x, p0y = px[e], py[e]
            dx = px[(e + 1) % 4] - p0x
            dy = py[(e + 1) % 4] - p0y
            t0 = jnp.zeros((br, bc), jnp.float32)
            t1 = jnp.ones((br, bc), jnp.float32)
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
                t0 = jnp.maximum(t0, lo)
                t1 = jnp.minimum(t1, hi)
            t0 = jnp.clip(t0, 0.0, 1.0)
            t1 = jnp.maximum(t0, jnp.clip(t1, 0.0, 1.0))
            q0x = p0x + t0 * dx
            q0y = p0y + t0 * dy
            q1x = p0x + t1 * dx
            q1y = p0y + t1 * dy
            total = total + 0.5 * (q0x * q1y - q0y * q1x)
        return total

    area = green_pass(rx, ry, cx, cy, 0.0) + green_pass(
        cx, cy, rx, ry, 1e-5
    )
    return jnp.abs(area)


def _mask_kernel(thresh_ref, rows_ref, cols_ref, out_ref):
    rows = rows_ref[:]  # (BR, 16)
    cols = cols_ref[:]  # (BC, 16)
    overlap = _overlap_tile(rows, cols)
    area_r = rows[:, 8][:, None]
    area_c = cols[:, 8][None, :]
    union = jnp.maximum(area_r + area_c - overlap, EPS)
    iou = overlap / union
    out_ref[:] = (iou > thresh_ref[0]).astype(jnp.int8)


def _pack(boxes):
    """(K, 7+) → (K, 16) packed [cx(4), cy(4), area, pad...] (padded to
    a lane-friendly width)."""
    from ..geometry import boxes_to_corners_bev

    corners = boxes_to_corners_bev(boxes)  # (K, 4, 2)
    area = boxes[:, 3] * boxes[:, 4]
    k = boxes.shape[0]
    packed = jnp.zeros((k, 16), jnp.float32)
    packed = packed.at[:, 0:4].set(corners[:, :, 0])
    packed = packed.at[:, 4:8].set(corners[:, :, 1])
    packed = packed.at[:, 8].set(area)
    return packed


@functools.partial(jax.jit, static_argnames=("block_r", "block_c", "interpret"))
def nms_suppression_mask(boxes, thresh, block_r: int = 256,
                         block_c: int = 512, interpret: bool = False):
    """(K, 7+) boxes → (K, K) int8 mask of IoU>thresh pairs."""
    k = boxes.shape[0]
    block_r = min(block_r, k)
    block_c = min(block_c, k)
    packed = _pack(boxes)
    thresh_arr = jnp.asarray([thresh], jnp.float32)

    grid = (pl.cdiv(k, block_r), pl.cdiv(k, block_c))
    return pl.pallas_call(
        _mask_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (block_r, 16), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block_c, 16), lambda i, j, *_: (j, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (block_r, block_c), lambda i, j, *_: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.int8),
        interpret=interpret,
    )(thresh_arr, packed, packed)
