"""FPS family vs sequential numpy oracles (CUDA-kernel semantics)."""

import numpy as np

from de6d_tpu.ops import sampling


def _fps_oracle(xyz, npoint):
    n = xyz.shape[0]
    mindist = np.full(n, 1e10)
    idxs = np.zeros(npoint, np.int32)
    last = 0
    for j in range(1, npoint):
        d = np.sum((xyz - xyz[last]) ** 2, -1)
        mindist = np.minimum(mindist, d)
        last = int(np.argmax(mindist))
        idxs[j] = last
    return idxs


def _wfps_oracle(xyz, w, npoint):
    n = xyz.shape[0]
    mindist = np.full(n, 1e10)
    idxs = np.zeros(npoint, np.int32)
    last = int(np.argmax(w))
    idxs[0] = last
    for j in range(1, npoint):
        d = np.sum((xyz - xyz[last]) ** 2, -1)
        mindist = np.minimum(mindist, d)
        key = mindist * np.maximum(w, 1e-12)
        last = int(np.argmax(key))
        idxs[j] = last
    return idxs


def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    idx = np.asarray(sampling.farthest_point_sample(xyz, 32))
    for b in range(2):
        np.testing.assert_array_equal(idx[b], _fps_oracle(xyz[b], 32))


def test_weighted_fps_matches_oracle(rng):
    xyz = rng.randn(1, 100, 3).astype(np.float32)
    w = rng.uniform(0, 1, (1, 100)).astype(np.float32)
    idx = np.asarray(sampling.weighted_farthest_point_sample(xyz, w, 16))
    np.testing.assert_array_equal(idx[0], _wfps_oracle(xyz[0], w[0], 16))


def test_matrix_fps_equals_plain_fps_on_euclidean(rng):
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    dm = np.asarray(sampling.calc_dist_matrix_for_sampling(xyz))
    idx_m = np.asarray(sampling.matrix_farthest_point_sample(dm, 16))
    idx_p = np.asarray(sampling.farthest_point_sample(xyz, 16))
    np.testing.assert_array_equal(idx_m, idx_p)


def test_fps_respects_valid_mask(rng):
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    valid = np.ones((1, 64), bool)
    valid[0, 32:] = False
    idx = np.asarray(sampling.farthest_point_sample(xyz, 16, valid))
    assert np.all(idx < 32)
    # matches oracle run on the valid prefix
    np.testing.assert_array_equal(idx[0], _fps_oracle(xyz[0, :32], 16))


def test_fused_dist_matrix(rng):
    xyz = rng.randn(1, 32, 3).astype(np.float32)
    feat = rng.randn(1, 32, 8).astype(np.float32)
    dm = np.asarray(sampling.calc_dist_matrix_for_sampling(xyz, feat, 2.0))
    i, j = 3, 17
    ref = np.sum((xyz[0, i] - xyz[0, j]) ** 2) + 2.0 * np.sum(
        (feat[0, i] - feat[0, j]) ** 2
    )
    np.testing.assert_allclose(dm[0, i, j], ref, rtol=1e-4)


def test_gather_and_topk(rng):
    pts = rng.randn(2, 10, 4).astype(np.float32)
    idx = np.array([[0, 3, 9], [1, 1, 2]], np.int32)
    out = np.asarray(sampling.gather_points(pts, idx))
    for b in range(2):
        np.testing.assert_allclose(out[b], pts[b, idx[b]])
    scores = rng.randn(1, 10).astype(np.float32)
    top = np.asarray(sampling.sample_top_k_by_score(scores, 3))
    np.testing.assert_array_equal(top[0], np.argsort(-scores[0])[:3])


def test_pallas_fps_matches_jnp(rng):
    """Whole-loop-in-one-kernel Pallas FPS (interpret mode) is
    bit-identical to the jnp fori_loop path: plain + weighted, ragged
    valid masks, npoint not a lane multiple, duplicate-pick regime
    (valid < npoint)."""
    import jax.numpy as jnp

    from de6d_tpu.ops.pallas.fps import fps_pallas

    for b, n, npoint, nvalid in [(2, 300, 96, None), (1, 128, 128, None),
                                 (3, 257, 60, 40), (2, 512, 200, 512)]:
        xyz = rng.standard_normal((b, n, 3)).astype(np.float32) * 10
        valid = np.ones((b, n), bool)
        if nvalid is not None:
            valid[:, nvalid:] = False
        ref = sampling._farthest_point_sample_jnp(
            jnp.asarray(xyz), npoint, jnp.asarray(valid))
        got = fps_pallas(jnp.asarray(xyz), jnp.asarray(valid), npoint,
                         interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

        w = rng.random((b, n)).astype(np.float32)
        ref_w = sampling._weighted_farthest_point_sample_jnp(
            jnp.asarray(xyz), jnp.asarray(w), npoint, jnp.asarray(valid))
        got_w = fps_pallas(jnp.asarray(xyz), jnp.asarray(valid), npoint,
                           weights=jnp.asarray(w), weighted=True,
                           interpret=True)
        np.testing.assert_array_equal(np.asarray(ref_w), np.asarray(got_w))


def test_pallas_matrix_fps_matches_jnp(rng):
    """DMA-row-streaming matrix FPS (interpret) bit-equal to jnp."""
    import jax.numpy as jnp

    from de6d_tpu.ops.pallas.fps import matrix_fps_pallas

    for b, n, npoint, nvalid in [(2, 200, 64, None), (1, 256, 90, 150)]:
        xyz = rng.standard_normal((b, n, 3)).astype(np.float32) * 5
        feats = rng.standard_normal((b, n, 8)).astype(np.float32)
        dm = sampling.calc_dist_matrix_for_sampling(
            jnp.asarray(xyz), jnp.asarray(feats))
        valid = np.ones((b, n), bool)
        if nvalid is not None:
            valid[:, nvalid:] = False
        ref = sampling._matrix_farthest_point_sample_jnp(
            dm, npoint, jnp.asarray(valid))
        got = matrix_fps_pallas(dm, jnp.asarray(valid), npoint,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
