"""Point-axis sharding (SURVEY §5.7): grouping stages of a dense scan
sharded over an 8-device 'points' mesh must match the unsharded ops
bit-exactly (no collectives in the partitioned program — each shard
owns a query slice against the replicated support set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.ops.ball_query import ball_query, query_and_group, three_nn
from de6d_tpu.parallel.point_sharding import (
    make_point_mesh, sharded_ball_query, sharded_query_and_group,
    sharded_three_nn,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_point_mesh(8)


@pytest.fixture(scope="module")
def dense_scan():
    """Waymo-dense synthetic scan: 180k support points, 8k queries
    (not divisible by 8? — 8191 to exercise padding)."""
    rng = np.random.RandomState(0)
    n, m = 180_000, 8191
    xyz = jnp.asarray(rng.uniform(-75, 75, (1, n, 3)).astype(np.float32))
    order = rng.permutation(n)[:m]
    new_xyz = xyz[:, order]
    feats = jnp.asarray(rng.normal(0, 1, (1, n, 8)).astype(np.float32))
    valid = jnp.asarray(rng.rand(1, n) > 0.05)
    return xyz, new_xyz, feats, valid


@pytest.mark.slow
def test_sharded_ball_query_matches(mesh8, dense_scan):
    xyz, new_xyz, _, valid = dense_scan
    idx_s, cnt_s = sharded_ball_query(
        mesh8, xyz, new_xyz, radius=2.0, nsample=16, valid_mask=valid
    )
    idx_u, cnt_u = ball_query(
        xyz, new_xyz, radius=2.0, nsample=16, valid_mask=valid
    )
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_u))
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_u))
    assert int(cnt_u.sum()) > 0


@pytest.mark.slow
def test_sharded_group_matches(mesh8, dense_scan):
    xyz, new_xyz, feats, valid = dense_scan
    g_s, cnt_s = sharded_query_and_group(
        mesh8, xyz, new_xyz, feats, radius=2.0, nsample=16,
        valid_mask=valid,
    )
    g_u, cnt_u = query_and_group(
        xyz, new_xyz, feats, radius=2.0, nsample=16, valid_mask=valid
    )
    np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_u))
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_u))


def test_sharded_three_nn_matches(mesh8):
    rng = np.random.RandomState(1)
    unknown = jnp.asarray(
        rng.uniform(-40, 40, (2, 1003, 3)).astype(np.float32)
    )
    known = jnp.asarray(rng.uniform(-40, 40, (2, 256, 3)).astype(np.float32))
    d_s, i_s = sharded_three_nn(mesh8, unknown, known)
    d_u, i_u = three_nn(unknown, known)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_u))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_u), rtol=1e-6)
