"""Pallas TPU kernel: FUSED greedy rotated NMS (mask + resolve in one
kernel, batched over samples), with a lane-compacted kept-box list.

The two-stage TPU NMS (``pallas/nms_mask.py`` suppression mask +
``ops/nms.py`` blocked resolve) is exact but materializes a (P, P)
float32 mask per sample in HBM — at P=4096 that is 64 MB written and
re-read per sample (~3 ms/batch of pure HBM traffic at KITTI scale)
plus ~4 kernel launches per sample under a sequential ``lax.map``.

This kernel is the reference CUDA bitmask kernel's design
(iou3d_nms_kernel.cu:267 ``nms_kernel``) restated for the TPU
execution model — the TPU grid runs SEQUENTIALLY, so the greedy
recurrence can be resolved column-block by column-block inside a
single launch — with one additional insight the CUDA kernel cannot
use: greedy suppression only ever flows from KEPT boxes, and the
caller discards keeps beyond ``post_maxsize`` anyway, so the external
suppression work per column block is O(kept so far), bounded by
``post_k`` — NOT O(columns so far). Per (sample, column-block) step:

  1. accumulate external suppression against the lane-COMPACTED kept
     list living in a (16, K_cap) VMEM scratch: at most
     ceil(min(n_kept, post_k)/128) rotated-IoU tiles (Green's-theorem
     polygon clipping, fully in registers), statically unrolled with
     ``pl.when`` count guards; unfilled lanes hold all-zero degenerate
     boxes whose IoU is exactly 0 — no masking needed;
  2. resolve the intra-block recurrence on the (BLK, BLK) diagonal
     tile with a register-resident fixpoint loop;
  3. append this block's kept boxes to the compacted list with ONE
     one-hot matmul (16,BLK)@(BLK,K_cap) on the MXU — no dynamic
     slicing, no scalar scatter loop;
  4. once n_kept ≥ post_k, later column blocks write zeros and do no
     IoU work at all (exact: the caller keeps only the first post_k
     kept boxes in score order — see ops/nms.py
     nms_candidates_batched's rank-top-k selection).

No pairwise mask ever touches HBM; the whole batch is one launch.
At P=4096 / post_k=500 the worst case (nothing gated, every box
live) runs ~ceil(kept/128)·n_blocks + n_blocks IoU tiles instead of
n_blocks²/2 — the suppression cost now scales with the answer size,
not the candidate count.

Exactness: processing columns in ascending index order (= descending
score) with all earlier columns fully resolved reproduces sequential
greedy NMS bit-for-bit (same argument as ops/nms.py
``_greedy_resolve_blocked``, tested against the brute oracle). With
``post_k`` < P the flags are truncated greedy NMS: exact through the
column block in which the post_k-th keep lands, all-zero after it —
indistinguishable to a caller that selects the first post_k keeps.

Match: reference NMS wrapper semantics at
core/pcdet/models/model_utils/model_nms_utils.py:6-25 (score-sorted
candidates, greedy rotated NMS, NMS_POST_MAXSIZE truncation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nms_mask import _green_tile, _pack

BLK = 128


def _make_fused_kernel(thresh: float, n_blocks: int, post_k: int,
                       k_cap: int):
    n_kept_blocks = k_cap // BLK

    def kernel(counts_ref, cols_ref, out_ref, keep_ref, kept_ref,
               ext_ref, nk_ref):
        j = pl.program_id(1)
        b = pl.program_id(0)

        # fresh sample: clear the compacted kept list + counter
        @pl.when(j == 0)
        def _reset():
            kept_ref[:, :] = jnp.zeros((16, k_cap), jnp.float32)
            nk_ref[0] = 0

        count = counts_ref[b]
        nk = nk_ref[0]
        col0 = j * BLK
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (BLK,), 0)

        # once post_k boxes are kept, every later keep is discarded by
        # the caller's first-post_k selection — skip the block outright
        needed = (col0 < count) & (nk < post_k)

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

            # 1) external suppression from the compacted kept list.
            # Statically unrolled with count guards (dynamic-start lane
            # slices are the one thing Mosaic makes expensive); lanes
            # beyond n_kept hold all-zero degenerate boxes → overlap 0,
            # area 0 → IoU exactly 0 → never > thresh. The accumulator
            # lives in a VMEM scratch row because a value cannot thread
            # across pl.when regions.
            ext_ref[0, :] = jnp.zeros((BLK,), jnp.int32)
            for r in range(n_kept_blocks):
                @pl.when(r * BLK < nk)
                def _ext_tile(r=r):
                    rows = kept_ref[:, r * BLK:(r + 1) * BLK]
                    sup = jnp.any(iou_vs(rows) > thresh, axis=0)
                    ext_ref[0, :] = ext_ref[0, :] | sup.astype(jnp.int32)
            ext = ext_ref[0, :] > 0

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

            # 3) append this block's keeps to the compacted list via a
            # one-hot matmul: sel[l, s] = (global position of kept lane
            # l == s). K_cap has one spare block beyond post_k so the
            # crossing block (nk < post_k at entry, nk' > post_k after)
            # always fits.
            # inclusive prefix sum via a triangular matmul (Mosaic has
            # no cumsum lowering): csum[s] = Σ_{l<=s} kb32[l]
            tri = (
                jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
                <= jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
            ).astype(jnp.float32)
            csum = jnp.dot(
                kb32.astype(jnp.float32)[None, :], tri,
                preferred_element_type=jnp.float32,
            )[0].astype(jnp.int32)
            pos = nk + csum - kb32  # (BLK,) i32
            s_iota = jax.lax.broadcasted_iota(
                jnp.int32, (BLK, k_cap), 1
            )
            sel = (
                (pos[:, None] == s_iota) & (kb32[:, None] > 0)
            ).astype(jnp.float32)
            # precision=HIGHEST: the MXU's default input precision is
            # bf16 — sel is a 0/1 one-hot (exact either way) but the
            # fp32 packed corners/areas in cols would be rounded to
            # ~2^-9 relative, perturbing every later external-
            # suppression IoU against the kept list (ADVICE r4 high).
            kept_ref[:, :] = kept_ref[:, :] + jnp.dot(
                cols, sel, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            nk_ref[0] = nk + jnp.sum(kb32)

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
    jax.jit, static_argnames=("thresh", "post_k", "interpret")
)
def nms_keep_batched(boxes, valid_counts, thresh: float,
                     post_k: int | None = None,
                     interpret: bool = False):
    """Batched fused greedy rotated NMS.

    Args:
        boxes: (B, P, 7+) candidates, score-DESCENDING per sample,
            invalid candidates as a suffix. P must be a multiple of
            128.
        valid_counts: (B,) int32 live-candidate counts.
        thresh: BEV rotated-IoU threshold.
        post_k: stop after this many keeps per sample (exact for a
            caller that consumes at most the first post_k keeps, e.g.
            NMS_POST_MAXSIZE). Default: P (full greedy NMS).

    Returns:
        keep: (B, P) bool greedy keep flags (False past the count;
        all-False for column blocks entered with ≥ post_k keeps).
    """
    b, p = boxes.shape[0], boxes.shape[1]
    assert p % BLK == 0, "candidate buffer must be a multiple of 128"
    n_blocks = p // BLK
    if post_k is None:
        post_k = p
    post_k = min(int(post_k), p)
    # one spare block: the block in which the post_k-th keep lands may
    # append up to BLK-1 keeps beyond it
    k_cap = (post_k + BLK - 1) // BLK * BLK + BLK
    k_cap = min(k_cap, p + BLK)
    packed = jax.vmap(_pack)(boxes)  # (B, 16, P)
    counts = jnp.asarray(valid_counts, jnp.int32).reshape(b)

    grid = (b, n_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # this step's column block (the kept list replaces the old
            # whole-sample row map)
            pl.BlockSpec(
                (1, 16, BLK), lambda bb, jj, c: (bb, 0, jj),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_blocks, BLK), lambda bb, jj, c: (bb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((n_blocks, BLK), jnp.int32),   # resolved keeps
            pltpu.VMEM((16, k_cap), jnp.float32),     # compacted kept
            pltpu.VMEM((1, BLK), jnp.int32),          # ext accumulator
            pltpu.SMEM((1,), jnp.int32),              # n_kept
        ],
    )
    keep = pl.pallas_call(
        _make_fused_kernel(float(thresh), n_blocks, post_k, k_cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_blocks, BLK), jnp.int32),
        interpret=interpret,
    )(counts, packed)
    return keep.reshape(b, p) > 0
