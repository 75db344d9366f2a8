"""OccAM attribution: similarity channels vs hand values + e2e shape/
normalization on a tiny model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from de6d_tpu.utils.analysis import occam


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def test_similarity_channels_hand_values():
    base = np.array([[0, 0, 0, 4.0, 2.0, 1.5, 0.0]], np.float32)
    pert = np.array([
        [0.5, 0, 0, 4.0, 2.0, 1.5, 0.25],   # overlapping, rotated
        [50, 50, 0, 4.0, 2.0, 1.5, 0.0],    # disjoint
    ], np.float32)
    labels_b = np.array([1])
    labels_p = np.array([1, 1])
    scores_p = np.array([0.8, 0.9], np.float32)
    valid, ch = occam.similarity_channels(
        base, labels_b, pert, labels_p, scores_p
    )
    assert valid.shape == (1, 2)
    assert valid[0, 0] == 1.0 and valid[0, 1] == 0.0
    np.testing.assert_allclose(ch[0][0], [0.8, 0.9])  # conf passthrough
    np.testing.assert_allclose(ch[1][0, 0], 0.5, atol=1e-6)  # 1-0.5m
    np.testing.assert_allclose(ch[3][0, 0], 1 - 0.25, atol=1e-6)  # yaw
    np.testing.assert_allclose(ch[2][0, 0], 1.0, atol=1e-5)  # same size

    # 9-DoF adds pitch/roll channels with the x4 factor
    base9 = np.concatenate([base, [[0.05, 0.0]]], axis=1)
    pert9 = np.concatenate([pert, [[0.1, 0.0], [0.0, 0.0]]], axis=1)
    _, ch9 = occam.similarity_channels(
        base9, labels_b, pert9, labels_p, scores_p
    )
    assert len(ch9) == 6
    np.testing.assert_allclose(ch9[4][0, 0], 1 - 0.05 * 4, atol=1e-5)


def test_occam_attribution_shapes(rng):
    import sys
    sys.path.insert(0, "tests")
    from model_fixtures import tiny_pointpillar_cfg

    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    cfg, _fixture_spec = tiny_pointpillar_cfg(num_class=1)
    spec = DatasetSpec(
        class_names=("Car",), point_feature_dim=4,
        point_cloud_range=(0, -12.8, -3, 25.6, 12.8, 1),
        voxel_size=(0.4, 0.4, 4.0), max_voxels=1000,
        max_points_per_voxel=8,
    )
    model = build_network(cfg, num_class=1, dataset=spec)
    n = 512
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 25, n)
    pts[:, 1] = rng.uniform(-12, 12, n)
    pts[:, 2] = rng.uniform(-2, 0, n)
    batch = {
        "points": jnp.asarray(pts[None]),
        "points_mask": jnp.ones((1, n), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    an = occam.OccamAnalyzer(
        model, variables, cfg, num_class=1, batch_size=4,
        lbda=0.8,
    )
    dets, attr, smap = an.attribute(pts, n_perturbations=8)
    k = len(dets["boxes"])
    assert attr.shape[1] == n
    assert attr.shape[0] == k
    assert smap.shape == (n,)
    assert smap.max() > 0
    assert np.isfinite(attr).all()
