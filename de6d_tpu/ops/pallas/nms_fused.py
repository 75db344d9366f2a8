"""Pallas TPU kernel: FUSED greedy rotated NMS (mask + resolve in one
kernel, batched over samples).

The two-stage TPU NMS (``pallas/nms_mask.py`` suppression mask +
``ops/nms.py`` blocked resolve) is exact but materializes a (P, P)
float32 mask per sample in HBM — at P=4096 that is 64 MB written and
re-read per sample (~3 ms/batch of pure HBM traffic at KITTI scale)
plus ~4 kernel launches per sample under a sequential ``lax.map``.

This kernel is the reference CUDA bitmask kernel's design
(iou3d_nms_kernel.cu:267 ``nms_kernel``) restated for the TPU
execution model: the TPU grid runs SEQUENTIALLY, so the greedy
recurrence can be resolved column-block by column-block inside a
single kernel launch, with the keep vector living in a VMEM scratch
that persists across grid steps. Per (sample, column-block) step:

  1. accumulate external suppression from all earlier, already
     RESOLVED blocks: iterate row blocks r < j, compute the rotated-
     IoU tile (Green's-theorem polygon clipping, fully in registers)
     against only the KEPT rows;
  2. resolve the intra-block recurrence on the (BLK, BLK) diagonal
     tile with a register-resident fixpoint loop;
  3. write the block's keep flags to scratch + output.

No pairwise mask ever touches HBM; the whole batch is one launch.
Tile skipping: candidates arrive score-sorted with the invalid ones
as a suffix (counts scalar-prefetched), so column blocks past the
count and row blocks past the count do no IoU work.

Exactness: processing columns in ascending index order (= descending
score) with all earlier columns fully resolved reproduces sequential
greedy NMS bit-for-bit (same argument as ops/nms.py
``_greedy_resolve_blocked``, tested against the brute oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nms_mask import _green_tile, _pack

BLK = 128


def _make_fused_kernel(thresh: float, n_blocks: int):
    def kernel(counts_ref, full_ref, cols_ref, out_ref, keep_ref):
        j = pl.program_id(1)
        b = pl.program_id(0)
        count = counts_ref[b]
        col0 = j * BLK
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (BLK,), 0)

        needed = col0 < count

        @pl.when(needed)
        def _compute():
            cols = cols_ref[0]  # (16, BLK)
            cx = [cols[i, :][None, :] for i in range(4)]
            cy = [cols[4 + i, :][None, :] for i in range(4)]
            area_c = cols[8, :][None, :]

            def iou_vs(rows):
                rx = [rows[i, :][:, None] for i in range(4)]
                ry = [rows[4 + i, :][:, None] for i in range(4)]
                overlap = _green_tile(rx, ry, cx, cy)
                area_r = rows[8, :][:, None]
                union = jnp.maximum(area_r + area_c - overlap, 1e-8)
                return overlap / union

            # 1) external suppression from resolved earlier blocks
            # the loop carry is an i32 vector — Mosaic cannot legalize
            # scf.for with i1 vector carries, and minor-dim inserts
            # ([:, None]) only exist for 32-bit types (canvas.py has
            # the same constraint)
            def row_body(r, ext32):
                rows = full_ref[0, :, pl.ds(r * BLK, BLK)]  # (16, BLK)
                krows32 = keep_ref[pl.ds(r, 1), :][0]  # (BLK,) i32
                sup = jnp.any(
                    (iou_vs(rows) > thresh) & (krows32[:, None] > 0),
                    axis=0,
                )
                return ext32 | sup.astype(jnp.int32)

            # row blocks strictly before col0, clipped to the valid
            # count (rows >= count are never kept anyway, but skipping
            # them saves the IoU tiles on gated workloads)
            n_rb = jnp.minimum(col0, count + BLK - 1) // BLK
            ext = jax.lax.fori_loop(
                0, n_rb, row_body, jnp.zeros((BLK,), jnp.int32)
            ) > 0

            # 2) intra-block resolve on the diagonal tile
            iou_d = iou_vs(cols)  # (BLK, BLK)
            upper = (
                jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
            )
            sub = (iou_d > thresh) & upper
            local_valid = (col_ids < count) & ~ext

            lv32 = local_valid.astype(jnp.int32)

            def fix_cond(state):
                kb32, prev32, it = state
                return jnp.any(kb32 != prev32) & (it < BLK)

            def fix_body(state):
                kb32, _, it = state
                sup = jnp.any(sub & (kb32[:, None] > 0), axis=0)
                return (
                    lv32 & ~sup.astype(jnp.int32) & 1,
                    kb32,
                    it + 1,
                )

            kb32, _, _ = jax.lax.while_loop(
                fix_cond,
                fix_body,
                (lv32, jnp.zeros((BLK,), jnp.int32), jnp.int32(0)),
            )
            keep_ref[pl.ds(j, 1), :] = kb32[None, :]

        @pl.when(jnp.logical_not(needed))
        def _skip():
            zeros = jnp.zeros((BLK,), jnp.int32)
            keep_ref[pl.ds(j, 1), :] = zeros[None, :]

        # the (1, n_blocks, BLK) output block maps the whole sample;
        # flush the resolved scratch plane on the sample's last step
        @pl.when(j == n_blocks - 1)
        def _flush():
            out_ref[0] = keep_ref[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("thresh", "interpret")
)
def nms_keep_batched(boxes, valid_counts, thresh: float,
                     interpret: bool = False):
    """Batched fused greedy rotated NMS.

    Args:
        boxes: (B, P, 7+) candidates, score-DESCENDING per sample,
            invalid candidates as a suffix. P must be a multiple of
            128.
        valid_counts: (B,) int32 live-candidate counts.
        thresh: BEV rotated-IoU threshold.

    Returns:
        keep: (B, P) bool greedy keep flags (False past the count).
    """
    b, p = boxes.shape[0], boxes.shape[1]
    assert p % BLK == 0, "candidate buffer must be a multiple of 128"
    n_blocks = p // BLK
    packed = jax.vmap(_pack)(boxes)  # (B, 16, P)
    counts = jnp.asarray(valid_counts, jnp.int32).reshape(b)

    grid = (b, n_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # whole-sample packed rows (for external-suppression tiles)
            pl.BlockSpec(
                (1, 16, p), lambda bb, jj, c: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # this step's column block
            pl.BlockSpec(
                (1, 16, BLK), lambda bb, jj, c: (bb, 0, jj),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_blocks, BLK), lambda bb, jj, c: (bb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((n_blocks, BLK), jnp.int32)],
    )
    keep = pl.pallas_call(
        _make_fused_kernel(float(thresh), n_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_blocks, BLK), jnp.int32),
        interpret=interpret,
    )(counts, packed, packed)
    return keep.reshape(b, p) > 0
