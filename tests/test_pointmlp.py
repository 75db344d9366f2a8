"""PointMLP backbone: shapes, masking, gradient flow, and PointRCNN
composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(17)


def _cfg():
    return {
        "NAME": "PointMLPBackBone",
        "EMBED": 16,
        "ENCODER": {
            "NPOINTS": [64, 32],
            "PRE_EXTRACTION": {
                "MLPS": [32, 64],
                "RES_BLOCK": [1, 1],
                "KNN": [8, 8],
            },
            "POS_EXTRACTION": {"RES_BLOCK": [1, 1]},
        },
        "DECODER": {"MLPS": [64, 32], "RES_BLOCK": [1, 1]},
    }


def test_pointmlp_backbone_shapes_and_grad(rng):
    from de6d_tpu.models.backbones_3d.pointmlp_backbone import (
        PointMLPBackBone,
    )

    b, n = 2, 128
    pts = rng.uniform(-10, 10, (b, n, 4)).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[1, 100:] = False
    bd = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.asarray(valid),
    }
    mod = PointMLPBackBone(model_cfg=_cfg(), input_channels=4)
    variables = mod.init(jax.random.PRNGKey(0), dict(bd), train=False)
    out = mod.apply(variables, dict(bd), train=False)
    assert out["point_features"].shape == (b, n, 32)
    assert out["point_coords"].shape == (b, n, 3)
    assert np.isfinite(np.asarray(out["point_features"])).all()

    def loss(params):
        o, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            dict(bd), train=True, mutable=["batch_stats"],
        )
        return jnp.sum(o["point_features"] ** 2)

    g = jax.grad(loss)(variables["params"])
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0
    ))
    assert np.isfinite(gn) and gn > 0


def test_pointmlp_knn_masks_invalid(rng):
    from de6d_tpu.models.backbones_3d.pointmlp_backbone import knn_point

    xyz = np.zeros((1, 8, 3), np.float32)
    xyz[0, :, 0] = np.arange(8)
    valid = np.ones((1, 8), bool)
    valid[0, 4:] = False
    q = np.array([[[7.0, 0, 0]]], np.float32)
    idx = np.asarray(knn_point(3, jnp.asarray(xyz), jnp.asarray(q),
                               jnp.asarray(valid)))[0, 0]
    assert set(idx) <= {0, 1, 2, 3}
