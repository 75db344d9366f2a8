"""Rotated IoU + NMS tests: golden cases, monte-carlo area oracle, and
a sequential greedy-NMS oracle."""

import numpy as np

from de6d_tpu.ops import iou3d, nms


def make_box(x, y, z, dx, dy, dz, yaw):
    return np.array([x, y, z, dx, dy, dz, yaw], dtype=np.float32)


def test_identical_boxes():
    a = make_box(0, 0, 0, 4, 2, 1.5, 0.7)[None]
    iou = np.asarray(iou3d.boxes_iou_bev(a, a))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-4)
    iou_3d = np.asarray(iou3d.boxes_iou3d(a, a))
    np.testing.assert_allclose(iou_3d, [[1.0]], atol=1e-4)


def test_axis_aligned_overlap():
    a = make_box(0, 0, 0, 2, 2, 2, 0.0)[None]
    b = make_box(1, 0, 0, 2, 2, 2, 0.0)[None]  # half-overlap in x
    ov = np.asarray(iou3d.boxes_overlap_bev(a, b))
    np.testing.assert_allclose(ov, [[2.0]], atol=1e-4)
    iou = np.asarray(iou3d.boxes_iou_bev(a, b))
    np.testing.assert_allclose(iou, [[2.0 / 6.0]], atol=1e-4)


def test_rotated_45_cross():
    # unit square vs same square rotated 45deg: intersection is a
    # regular octagon with area 2*(sqrt(2)-1) ≈ 0.8284
    a = make_box(0, 0, 0, 1, 1, 1, 0.0)[None]
    b = make_box(0, 0, 0, 1, 1, 1, np.pi / 4)[None]
    ov = np.asarray(iou3d.boxes_overlap_bev(a, b))
    np.testing.assert_allclose(ov, [[2 * (np.sqrt(2) - 1)]], atol=1e-4)


def test_disjoint():
    a = make_box(0, 0, 0, 2, 2, 2, 0.3)[None]
    b = make_box(10, 10, 0, 2, 2, 2, -0.5)[None]
    np.testing.assert_allclose(
        np.asarray(iou3d.boxes_iou_bev(a, b)), [[0.0]], atol=1e-6
    )


def _mc_overlap(box_a, box_b, n=200_000, seed=0):
    """Monte-carlo BEV overlap area oracle."""
    rng = np.random.RandomState(seed)
    lo = np.minimum(box_a[:2], box_b[:2]) - max(box_a[3:5].max(), box_b[3:5].max())
    hi = np.maximum(box_a[:2], box_b[:2]) + max(box_a[3:5].max(), box_b[3:5].max())
    pts = rng.uniform(lo, hi, (n, 2))

    def inside(box, p):
        c, s = np.cos(box[6]), np.sin(box[6])
        d = p - box[:2]
        local = np.stack([c * d[:, 0] + s * d[:, 1], -s * d[:, 0] + c * d[:, 1]], 1)
        return np.all(np.abs(local) <= box[3:5] / 2, axis=1)

    frac = np.mean(inside(box_a, pts) & inside(box_b, pts))
    return frac * np.prod(hi - lo)


def test_random_rotated_vs_monte_carlo(rng):
    boxes_a = np.zeros((6, 7), np.float32)
    boxes_b = np.zeros((6, 7), np.float32)
    for arr in (boxes_a, boxes_b):
        arr[:, 0:2] = rng.uniform(-2, 2, (6, 2))
        arr[:, 2] = 0
        arr[:, 3:5] = rng.uniform(1.5, 4, (6, 2))
        arr[:, 5] = 1.5
        arr[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    ov = np.asarray(iou3d.boxes_overlap_bev(boxes_a, boxes_b))
    for i in range(6):
        ref = _mc_overlap(boxes_a[i], boxes_b[i], seed=i)
        assert abs(ov[i, i] - ref) < 0.08, (i, ov[i, i], ref)


def test_aligned_iou3d():
    a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    b = np.array([[1, 1, 1, 2, 2, 2, 0.0]], np.float32)
    out = np.asarray(iou3d.boxes_aligned_iou3d(a, b))
    np.testing.assert_allclose(out, [1.0 / 15.0], atol=1e-5)


def _greedy_nms_oracle(iou_mat, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and iou_mat[i, j] > thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_sequential_oracle(rng):
    n = 64
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 3:5] = rng.uniform(1.5, 4, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    iou_mat = np.asarray(iou3d.boxes_iou_bev(boxes, boxes))
    expect = _greedy_nms_oracle(iou_mat, scores, 0.2)

    idx, count = nms.nms(boxes, scores, 0.2, pre_maxsize=n, post_maxsize=n)
    got = np.asarray(idx)[: int(count)]
    np.testing.assert_array_equal(sorted(got), sorted(expect))
    # score-descending order preserved
    assert np.all(np.diff(scores[got]) <= 1e-6 + 0)


def test_nms_valid_mask_and_padding(rng):
    n = 16
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = np.arange(n) * 100  # all disjoint
    boxes[:, 3:6] = 1.0
    scores = np.linspace(1, 0.1, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[5:] = False
    idx, count = nms.nms(
        boxes, scores, 0.5, pre_maxsize=n, post_maxsize=8, valid_mask=valid
    )
    assert int(count) == 5
    np.testing.assert_array_equal(np.asarray(idx)[:5], np.arange(5))


def test_pallas_mask_kernel_interpret(rng):
    """The Pallas suppression-mask kernel (interpret mode) must agree
    with the XLA IoU path on the region greedy NMS consumes: the strict
    upper triangle within the valid candidate count. Tiles past the
    count or below the diagonal skip compute and write zeros."""
    from de6d_tpu.ops.pallas.nms_mask import nms_suppression_mask

    n = 96
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 3:5] = rng.uniform(1.5, 4, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    thresh = 0.2
    ref = np.asarray(iou3d.boxes_iou_bev(boxes, boxes)) > thresh

    for count, br, bc in [(n, 32, 32), (40, 32, 32), (0, 32, 32),
                          (70, 16, 64)]:
        got = np.asarray(
            nms_suppression_mask(
                boxes, thresh, valid_count=count, block_r=br, block_c=bc,
                interpret=True,
            )
        ) > 0.5
        upper = np.triu(np.ones((n, n), bool), k=1)
        in_count = (np.arange(n)[:, None] < count) & (
            np.arange(n)[None, :] < count
        )
        region = upper & in_count
        np.testing.assert_array_equal(got[region], ref[region])
        # fully-skipped tiles must be all zeros (skip is tile-granular;
        # entries past the count inside needed tiles are harmless since
        # those candidates are invalid in the resolve)
        tr = (np.arange(n)[:, None] // br) * br  # tile row start
        tc = (np.arange(n)[None, :] // bc) * bc  # tile col start
        skipped = (tr >= count) | (tc >= count) | (tr >= tc + bc - 1)
        assert not got[skipped].any()


def test_nms_count_bounded_resolve(rng):
    """nms() with a score gate (invalid suffix) must match the dense
    oracle — exercises the count-bounded blocked resolve path."""
    n = 128
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-15, 15, (n, 2))
    boxes[:, 3:5] = rng.uniform(1.5, 4, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = scores > 0.55  # ~45% survive, invalid form a suffix post-sort

    iou_mat = np.asarray(iou3d.boxes_iou_bev(boxes, boxes))
    masked_scores = np.where(valid, scores, -np.inf)
    expect = [
        i for i in _greedy_nms_oracle(iou_mat, masked_scores, 0.2)
        if valid[i]
    ]
    idx, count = nms.nms(
        boxes, scores, 0.2, pre_maxsize=n, post_maxsize=n, valid_mask=valid
    )
    got = np.asarray(idx)[: int(count)]
    np.testing.assert_array_equal(sorted(got), sorted(expect))


def test_select_candidates_matches_topk(rng):
    """Candidate selection must equal lax.top_k exactly (the r3
    compaction fast path was removed after measuring it 3.5 ms/scan
    slower end-to-end — see ops/nms.py:_select_candidates)."""
    import jax
    import jax.numpy as jnp

    n, pre = 4096, 256
    scores = np.full(n, nms.NEG_INF, np.float32)
    live_idx = rng.choice(n, 100, replace=False)
    scores[live_idx] = rng.uniform(0.1, 1.0, 100).astype(np.float32)
    scores[live_idx[:10]] = 0.5  # score ties

    s_fast, o_fast = jax.jit(
        lambda s: nms._select_candidates(s, pre)
    )(jnp.asarray(scores))
    s_ref, o_ref = jax.lax.top_k(jnp.asarray(scores), pre)
    np.testing.assert_array_equal(np.asarray(s_fast), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(o_fast), np.asarray(o_ref))


def test_fused_nms_kernel_interpret(rng):
    """The fused Pallas NMS (mask + greedy resolve in one kernel,
    batched) must reproduce per-sample nms_candidates exactly —
    including suppression chains crossing 128-blocks, gated invalid
    suffixes, and empty samples."""
    import jax.numpy as jnp
    from de6d_tpu.ops.pallas.nms_fused import nms_keep_batched

    b, p = 3, 256
    boxes = np.zeros((b, p, 7), np.float32)
    boxes[..., 0:2] = rng.uniform(-12, 12, (b, p, 2))
    boxes[..., 3:5] = rng.uniform(1.5, 4, (b, p, 2))
    boxes[..., 5] = 1.5
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, p))
    # a dense chain cluster to force cross-block suppression chains
    boxes[:, :80, 0:2] = rng.uniform(-3, 3, (b, 80, 2))
    scores = -np.sort(-rng.uniform(0, 1, (b, p)).astype(np.float32), axis=1)
    counts = np.array([p, 130, 0], np.int32)
    ts = scores.copy()
    for i, c in enumerate(counts):
        ts[i, c:] = nms.NEG_INF

    keep = np.asarray(
        nms_keep_batched(jnp.asarray(boxes), jnp.asarray(counts), 0.2,
                         interpret=True)
    )
    for i in range(b):
        sel_ref, cnt_ref = nms.nms_candidates(
            jnp.asarray(boxes[i]), jnp.asarray(ts[i]),
            thresh=0.2, post_maxsize=p, iou_kind="rotated",
        )
        ref_keep = np.zeros(p, bool)
        ref_keep[np.asarray(sel_ref)[: int(cnt_ref)]] = True
        np.testing.assert_array_equal(keep[i], ref_keep, err_msg=f"sample {i}")


def test_fused_nms_post_k_truncation(rng):
    """With post_k set, the fused kernel's flags must be EXACT greedy
    keeps through the column block where the post_k-th keep lands and
    all-zero afterwards — so a caller that selects the first post_k
    keeps in score order (NMS_POST_MAXSIZE semantics,
    ops/nms.py nms_candidates_batched) sees identical results."""
    import jax.numpy as jnp
    from de6d_tpu.ops.pallas.nms_fused import nms_keep_batched, BLK

    b, p, post_k = 2, 512, 40
    boxes = np.zeros((b, p, 7), np.float32)
    # dense field so keeps accumulate slowly across many blocks
    boxes[..., 0:2] = rng.uniform(-40, 40, (b, p, 2))
    boxes[..., 3:5] = rng.uniform(1.5, 4, (b, p, 2))
    boxes[..., 5] = 1.5
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, p))
    counts = np.array([p, p - 100], np.int32)

    full = np.asarray(nms_keep_batched(
        jnp.asarray(boxes), jnp.asarray(counts), 0.3, interpret=True
    ))
    trunc = np.asarray(nms_keep_batched(
        jnp.asarray(boxes), jnp.asarray(counts), 0.3, post_k=post_k,
        interpret=True,
    ))
    for i in range(b):
        kept_idx = np.flatnonzero(full[i])
        assert kept_idx.size > post_k, "test needs keeps beyond post_k"
        # the block containing the post_k-th keep is the last one with
        # any flags; everything through it must match the full run
        crossing_block = kept_idx[post_k - 1] // BLK
        hi = (crossing_block + 1) * BLK
        np.testing.assert_array_equal(trunc[i, :hi], full[i, :hi])
        assert not trunc[i, hi:].any()
        # first post_k keeps agree ⇒ caller's selection is identical
        np.testing.assert_array_equal(
            np.flatnonzero(trunc[i])[:post_k], kept_idx[:post_k]
        )


def test_nms_candidates_batched_fallback(rng):
    """Off-TPU, nms_candidates_batched must equal lax.map of
    nms_candidates (the exact per-sample path)."""
    import jax
    import jax.numpy as jnp

    b, p = 4, 64
    boxes = np.zeros((b, p, 7), np.float32)
    boxes[..., 0:2] = rng.uniform(-10, 10, (b, p, 2))
    boxes[..., 3:5] = rng.uniform(1.5, 4, (b, p, 2))
    boxes[..., 5] = 1.5
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, p))
    scores = -np.sort(-rng.uniform(0, 1, (b, p)).astype(np.float32), axis=1)
    scores[1, 40:] = nms.NEG_INF
    scores[3, :] = nms.NEG_INF

    sel, count = nms.nms_candidates_batched(
        jnp.asarray(boxes), jnp.asarray(scores),
        thresh=0.25, post_maxsize=32, iou_kind="rotated",
    )
    for i in range(b):
        sel_ref, cnt_ref = nms.nms_candidates(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]),
            thresh=0.25, post_maxsize=32, iou_kind="rotated",
        )
        assert int(count[i]) == int(cnt_ref)
        np.testing.assert_array_equal(
            np.asarray(sel[i])[: int(cnt_ref)],
            np.asarray(sel_ref)[: int(cnt_ref)],
        )


def test_top_k_two_stage_matches_topk(rng):
    """Two-stage (cell-max prune + two-key sort) top-k is bit-identical
    to lax.top_k incl. tie order, across tie-heavy and gated inputs."""
    import jax
    import jax.numpy as jnp

    for B, ncells, group, pre in [(4, 64, 6, 16), (2, 128, 2, 32),
                                  (1, 96, 6, 24), (3, 50, 4, 200)]:
        A = ncells * group
        # quantized scores force many exact ties across cells
        s = np.round(rng.random((B, A)).astype(np.float32) * 8) / 8
        # gate some to NEG_INF like post_processing does
        s[rng.random((B, A)) < 0.3] = nms.NEG_INF
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(s), min(pre, A))
        got_v, got_i = nms.top_k_two_stage(
            jnp.asarray(s), min(pre, A), group
        )
        np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
