"""Rotated NMS — fixed-shape, jit-compatible.

TPU-native replacement for the reference's 64-bit-bitmask CUDA NMS
(iou3d_nms_kernel.cu:267-360 `nms_kernel` / `nms_normal_kernel`).

Design: sort candidates by score, build the pairwise suppression mask
(IoU > thresh, upper triangle) in row chunks, then resolve the greedy
recurrence

    keep[j] = valid[j] & not OR_{i<j} (keep[i] & mask[i, j])

by fixpoint iteration (lax.while_loop). Each sweep propagates
suppression one chain-link deeper; real detection workloads converge in
a handful of sweeps, and the loop exits exactly at the fixpoint, so the
result equals sequential greedy NMS bit-for-bit.

Everything returns fixed-size index buffers + a validity count so the
surrounding code stays shape-stable under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import iou3d

NEG_INF = -1e9


def _pairwise_iou_chunked(boxes, iou_fn, row_chunk: int = 64):
    """(K, 7+) → (K, K) IoU computed in row chunks to bound scratch."""
    k = boxes.shape[0]
    row_chunk = min(row_chunk, k)
    pad = (-k) % row_chunk
    padded = jnp.pad(boxes, ((0, pad), (0, 0)))
    rows = padded.reshape(-1, row_chunk, boxes.shape[1])
    iou = jax.lax.map(lambda r: iou_fn(r, boxes), rows)
    return iou.reshape(-1, k)[:k]


def _greedy_resolve(mask, valid):
    """Resolve greedy keep vector from the (K, K) suppression mask
    (mask[i, j]: i suppresses j, i < j enforced by caller) — Jacobi
    fixpoint sweeps. Exact (any fixpoint of the recurrence is the
    greedy solution) but needs ~chain-depth sweeps over K² each."""

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < mask.shape[0])

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(mask & keep[:, None], axis=0)
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
    )
    return keep


def _greedy_resolve_blocked(mask, valid, count=None, block: int = 64):
    """Exact greedy resolve in ONE sequential pass over column blocks
    (the strategy of the reference CUDA bitmask kernel,
    iou3d_nms_kernel.cu:267): for each block of `block` candidates,
    apply suppression from already-resolved earlier candidates
    (one masked (K, block) reduction), then resolve the intra-block
    recurrence with local fixpoint sweeps on the (block, block) tile.
    Total work ≈ one K² sweep instead of chain-depth sweeps.

    `count` (traced int32, optional): number of valid candidates —
    candidates are score-sorted so invalid ones form a suffix whose
    blocks can be skipped (their keep stays at the init value `valid`,
    which is False there)."""
    k = mask.shape[0]
    assert k % block == 0
    n_blocks = k // block
    idx = jnp.arange(k)

    def body(b, keep):
        col0 = b * block
        mask_cols = jax.lax.dynamic_slice(
            mask, (0, col0), (k, block)
        )  # (K, block)
        prev = keep & (idx < col0)
        ext_suppressed = jnp.any(
            mask_cols & prev[:, None], axis=0
        )  # (block,)
        valid_b = jax.lax.dynamic_slice(valid, (col0,), (block,))
        local_valid = valid_b & ~ext_suppressed
        sub = jax.lax.dynamic_slice(
            mask_cols, (col0, 0), (block, block)
        )  # strictly upper-triangular within the block

        def fix_body(state):
            kb, prev_kb, it = state
            sup = jnp.any(sub & kb[:, None], axis=0)
            return local_valid & ~sup, kb, it + 1

        def fix_cond(state):
            kb, prev_kb, it = state
            return jnp.any(kb != prev_kb) & (it < block)

        kb, _, _ = jax.lax.while_loop(
            fix_cond, fix_body,
            (local_valid, jnp.zeros_like(local_valid), jnp.int32(0)),
        )
        return jax.lax.dynamic_update_slice(keep, kb, (col0,))

    if count is None:
        return jax.lax.fori_loop(0, n_blocks, body, valid)
    blocks_needed = jnp.minimum(
        (jnp.asarray(count, jnp.int32) + block - 1) // block, n_blocks
    )

    def w_cond(state):
        b, _ = state
        return b < blocks_needed

    def w_body(state):
        b, keep = state
        return b + 1, body(b, keep)

    _, keep = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), valid))
    return keep


def _select_candidates(scores, pre: int):
    """Top-`pre` candidates by score: plain `lax.top_k`.

    Negative result, kept as documentation (r3, measured on v5e via
    bench.py pipeline deltas): a gated-count fast path that compacted
    the <=pre live candidates with cumsum+scatter and sorted only the
    (pre,) buffer — falling back to full top_k via lax.cond for the
    thresh=0 overflow case — was 3.5 ms/scan SLOWER than top_k on the
    realistic gated workload (113.8 vs 188.8 scans/s end to end). The
    321k-element cumsum and the scatters lower to sequential HBM
    passes that cost far more than XLA's fused top_k; candidate
    selection is not the NMS bottleneck."""
    return jax.lax.top_k(scores, pre)


def top_k_two_stage(scores, pre: int, group: int):
    """Exact top-`pre` of (B, A) `scores` where A = ncells * `group`
    and anchor index is cell-major (idx = cell*group + slot).

    Bit-identical to ``jax.lax.top_k(scores, pre)`` including tie
    order (equal values -> lower index first), but sorts far fewer
    elements: stage 1 ranks cells by their per-cell max (top_k over
    A/group), stage 2 two-key-sorts only the `pre` kept cells'
    anchors (pre*group elements) by (-score, global index).

    Exactness: for an anchor a in the global top-`pre`, every cell
    ranked strictly before a's cell (by cell-max desc, cell idx asc —
    lax.top_k's own tie rule) contributes a distinct anchor that also
    outranks a globally, and there are < `pre` such anchors, so a's
    cell survives stage 1; stage 2's lexicographic (-score, idx) sort
    then reproduces top_k's exact value/tie order.

    Replaces the single (B, 321k) top_k in post_processing (~6 ms/
    batch-of-8 on the v5e tunnel) with a 53k top_k + a 24.5k sort.
    """
    B, A = scores.shape
    ncells = A // group
    assert ncells * group == A, (A, group)
    kc = min(pre, ncells)
    cell_view = scores.reshape(B, ncells, group)
    cell_max = jnp.max(cell_view, axis=-1)  # (B, ncells)
    if B == 1:
        # same TPU windowed-sort lowering CHECK-fail workaround as
        # post_processing's batched top_k (f32[1, A] TransformWindow)
        _, cells = jax.lax.top_k(cell_max[0], kc)
        cells = cells[None]
    else:
        _, cells = jax.lax.top_k(cell_max, kc)  # (B, kc)
    rows = jnp.take_along_axis(
        cell_view, cells[..., None], axis=1
    )  # (B, kc, group)
    ids = cells[..., None] * group + jnp.arange(group, dtype=cells.dtype)
    flat = rows.reshape(B, kc * group)
    fid = ids.reshape(B, kc * group)
    neg_sorted, id_sorted = jax.lax.sort(
        (-flat, fid), dimension=-1, num_keys=2
    )
    return -neg_sorted[:, :pre], id_sorted[:, :pre]


@functools.partial(
    jax.jit,
    static_argnames=("thresh", "pre_maxsize", "post_maxsize", "iou_kind"),
)
def nms(
    boxes,
    scores,
    thresh: float,
    pre_maxsize: int = 4096,
    post_maxsize: int = 500,
    valid_mask=None,
    iou_kind: str = "rotated",
):
    """Greedy NMS over fixed-size buffers.

    Args:
        boxes: (N, 7+) — only the first 7 dims are used, matching the
            reference which NMSes 9-DoF boxes on [:, 0:7]
            (model_nms_utils.py:18).
        scores: (N,).
        thresh: IoU threshold.
        valid_mask: (N,) optional bool; invalid boxes never selected.
        iou_kind: 'rotated' (nms_gpu parity) or 'aligned'
            (nms_normal_gpu parity).

    Returns:
        idx: (post_maxsize,) int32 indices into the input (padded with
             the top candidate index; consume with ``count``),
        count: () int32 number of valid selections.
    """
    # NMS returns integer selections — non-differentiable by nature
    # (the reference calls it inside torch.no_grad / on detached
    # tensors). stop_gradient here keeps the Pallas mask kernel out of
    # JVP tracing when a caller (e.g. proposal_layer) sits inside a
    # differentiated train step.
    boxes = jax.lax.stop_gradient(boxes)
    scores = jax.lax.stop_gradient(scores)
    n = boxes.shape[0]
    pre = min(pre_maxsize, n)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    top_scores, order = _select_candidates(scores, pre)
    cand = boxes[order]
    sel, count = nms_candidates(
        cand, top_scores, thresh=thresh, post_maxsize=post_maxsize,
        iou_kind=iou_kind,
    )
    return order[sel].astype(jnp.int32), count


@functools.partial(
    jax.jit, static_argnames=("thresh", "post_maxsize", "iou_kind")
)
def nms_candidates(
    cand,
    top_scores,
    thresh: float,
    post_maxsize: int = 500,
    iou_kind: str = "rotated",
):
    """Greedy NMS over ALREADY-SELECTED candidates, score-descending.

    Split out of :func:`nms` so callers with a batch dim can hoist the
    expensive top-`pre` selection into ONE batched `lax.top_k` (the
    per-sample `lax.map` in post_processing would otherwise run B
    sequential 321k-element top_k's) and map only this candidate-level
    resolve.

    Args:
        cand: (P, 7+) candidate boxes, descending score order.
        top_scores: (P,) scores; NEG_INF marks padding slots.

    Returns:
        sel: (post_maxsize,) int32 indices into the CANDIDATE axis
             (padded with 0; consume with ``count``),
        count: () int32 number of valid selections.
    """
    cand = jax.lax.stop_gradient(cand)
    top_scores = jax.lax.stop_gradient(top_scores)
    pre = cand.shape[0]
    cand_valid = top_scores > NEG_INF / 2
    count_pre = jnp.sum(cand_valid.astype(jnp.int32))

    if iou_kind == "rotated" and jax.default_backend() == "tpu":
        # fused Pallas suppression-mask kernel (registers, no HBM
        # round-trips for the per-pair intermediates); tiles past the
        # valid candidate count or below the diagonal skip compute
        from .pallas.nms_mask import nms_suppression_mask

        over = nms_suppression_mask(
            cand[:, :7], float(thresh), valid_count=count_pre
        ) > 0.5
    else:
        iou_fn = (
            iou3d.boxes_iou_bev
            if iou_kind == "rotated" else iou3d.boxes_iou_normal
        )
        over = _pairwise_iou_chunked(cand[:, :7], iou_fn) > thresh
    upper = jnp.triu(jnp.ones((pre, pre), dtype=bool), k=1)
    mask = over & upper

    if pre % 64 == 0:
        keep = _greedy_resolve_blocked(mask, cand_valid, count=count_pre)
    else:
        keep = _greedy_resolve(mask, cand_valid)

    # compact kept indices to the front, preserving score order:
    # top_k over the negated rank selects `post` of `pre` (ties — the
    # pruned slots — break to the lowest index, matching a stable
    # argsort) without sorting the full buffer
    post = min(post_maxsize, pre)
    keep_rank = jnp.where(keep, jnp.arange(pre), pre)
    sel = jax.lax.top_k(-keep_rank, post)[1]
    sel_valid = keep[sel]
    count = jnp.sum(sel_valid.astype(jnp.int32))
    sel = jnp.where(sel_valid, sel, 0)
    return sel.astype(jnp.int32), count


@functools.partial(
    jax.jit, static_argnames=("thresh", "post_maxsize", "iou_kind")
)
def nms_candidates_batched(
    cand,
    top_scores,
    thresh: float,
    post_maxsize: int = 500,
    iou_kind: str = "rotated",
):
    """Batched greedy NMS over pre-selected candidates.

    Semantics are exactly ``jax.lax.map`` of :func:`nms_candidates`
    over the batch dim, but on TPU the whole batch resolves inside ONE
    fused Pallas launch (``pallas/nms_fused.py``): no (P, P) mask in
    HBM, no per-sample kernel-launch train. The kept-index compaction
    and count are likewise batched (one ``top_k`` for all samples).

    Args:
        cand: (B, P, 7+) candidates, score-descending per sample.
        top_scores: (B, P); NEG_INF marks padding slots.

    Returns:
        sel: (B, post_maxsize) int32 indices into the candidate axis,
        count: (B,) int32 valid selections per sample.
    """
    b, pre = cand.shape[0], cand.shape[1]
    cand_valid = top_scores > NEG_INF / 2
    counts_pre = jnp.sum(cand_valid.astype(jnp.int32), axis=1)

    if (
        iou_kind == "rotated"
        and jax.default_backend() == "tpu"
        and pre % 128 == 0
    ):
        from .pallas.nms_fused import nms_keep_batched

        post_k = min(post_maxsize, pre)
        k0 = 1024
        if pre > k0:
            # exact prefix cascade: greedy keep decisions for the
            # score-descending prefix [0, k0) depend only on that
            # prefix (suppression flows strictly high→low score), so
            # if the prefix already keeps `post` boxes — or a sample
            # has <= k0 live candidates — the first `post` selections
            # are fully determined and the (pre, pre) mask work (16x
            # at 4096→1024) never runs. One lax.cond falls back to the
            # full-width kernel otherwise (whose suppression work is
            # itself bounded by post_k keeps — see nms_fused.py).
            keep0 = nms_keep_batched(
                cand[:, :k0, :7], jnp.minimum(counts_pre, k0),
                float(thresh), post_k=post_k,
            )
            c0 = jnp.sum(keep0.astype(jnp.int32), axis=1)
            done = jnp.all((c0 >= post_k) | (counts_pre <= k0))
            keep = jax.lax.cond(
                done,
                lambda _: jnp.pad(keep0, ((0, 0), (0, pre - k0))),
                lambda _: nms_keep_batched(
                    cand[..., :7], counts_pre, float(thresh),
                    post_k=post_k,
                ),
                None,
            )
        else:
            keep = nms_keep_batched(
                cand[..., :7], counts_pre, float(thresh), post_k=post_k,
            )
    else:
        # fallback: per-sample mask + resolve (exact same semantics)
        def single(args):
            cb, tsb = args
            sel_s, cnt_s = nms_candidates(
                cb, tsb, thresh=thresh, post_maxsize=post_maxsize,
                iou_kind=iou_kind,
            )
            return sel_s, cnt_s

        sel, count = jax.lax.map(single, (cand, top_scores))
        return sel, count

    post = min(post_maxsize, pre)
    idx = jnp.arange(pre)
    keep_rank = jnp.where(keep, idx[None, :], pre)
    sel = jax.lax.top_k(-keep_rank, post)[1]  # (B, post)
    sel_valid = jnp.take_along_axis(keep, sel, axis=1)
    count = jnp.sum(sel_valid.astype(jnp.int32), axis=1)
    sel = jnp.where(sel_valid, sel, 0)
    return sel.astype(jnp.int32), count


def class_agnostic_nms(
    box_scores,
    box_preds,
    nms_config,
    score_thresh: float | None = None,
    valid_mask=None,
):
    """Parity: model_nms_utils.class_agnostic_nms (model_nms_utils.py:6-25)
    with fixed-shape outputs.

    Returns (selected_idx (post,), selected_count, selected_scores (post,)).
    """
    if valid_mask is None:
        valid_mask = jnp.ones(box_scores.shape[0], dtype=bool)
    if score_thresh is not None:
        valid_mask = valid_mask & (box_scores >= score_thresh)
    idx, count = nms(
        box_preds,
        box_scores,
        thresh=float(nms_config.NMS_THRESH),
        pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
        post_maxsize=int(nms_config.NMS_POST_MAXSIZE),
        valid_mask=valid_mask,
        iou_kind="aligned" if "normal" in str(nms_config.NMS_TYPE) else "rotated",
    )
    post = idx.shape[0]
    in_range = jnp.arange(post) < count
    sel_scores = jnp.where(in_range, box_scores[idx], NEG_INF)
    return idx, count, sel_scores
