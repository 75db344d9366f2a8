"""PointHeadBox6D (direct-regression full-pose head) + rotation
conversion helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from de6d_tpu.ops import geometry as G


@pytest.fixture
def rng():
    return np.random.RandomState(5)


def test_rotvec_euler_roundtrip_vs_scipy(rng):
    from scipy.spatial.transform import Rotation

    eul = np.stack(
        [
            rng.uniform(-np.pi, np.pi, 100),
            rng.uniform(-0.6, 0.6, 100),
            rng.uniform(-0.6, 0.6, 100),
        ],
        -1,
    ).astype(np.float32)
    eul[:5, 0] = np.pi - 1e-4  # near the log-map singularity
    ref = Rotation.from_euler("zyx", eul).as_rotvec()
    got = np.asarray(
        G.euler_zyx_to_rotvec(
            jnp.asarray(eul[:, 0]), jnp.asarray(eul[:, 1]),
            jnp.asarray(eul[:, 2]),
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)
    back = np.asarray(G.rotvec_to_euler_zyx(jnp.asarray(got)))
    ref_eul = Rotation.from_rotvec(ref).as_euler("zyx")
    np.testing.assert_allclose(back, ref_eul, atol=2e-4)


def _head_cfg():
    return {
        "NAME": "PointHeadBox6D",
        "CLASS_AGNOSTIC": False,
        "USE_BN": True,
        "CLS_FC": [16],
        "REG_FC": [16],
        "ROT_CLS_FC": [16],
        "ROT_REG_FC": [16],
        "TARGET_CONFIG": {
            "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
            "BOX_CODER": "PointResidualCoder",
            "BOX_CODER_CONFIG": {
                "use_mean_size": True,
                "mean_size": [[3.9, 1.6, 1.56]],
            },
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "point_cls_weight": 1.0,
                "point_box_weight": 1.0,
                "point_rot_cls_weight": 1.0,
                "point_rot_reg_weight": 1.0,
                "code_weights": [1.0] * 8,
            }
        },
    }


def test_point_head_box6d_forward_targets_loss(rng):
    from de6d_tpu.models.dense_heads.point_head_box6d import (
        PointHeadBox6D, point_head_box6d_loss,
    )
    from de6d_tpu.utils import box_coder_utils

    cfg = _head_cfg()
    head = PointHeadBox6D(model_cfg=cfg, num_class=1)
    b, n = 2, 128
    coords = rng.uniform(-10, 10, (b, n, 3)).astype(np.float32)
    # sloped 9-DoF gt with points planted inside
    gt = np.zeros((b, 2, 10), np.float32)
    gt[0, 0] = [0, 0, 0, 4.0, 1.6, 1.5, 0.4, -0.2, 0.05, 1]
    gt[1, 0] = [2, 1, 0, 4.0, 1.6, 1.5, -0.3, 0.0, 0.0, 1]
    coords[0, :30] = gt[0, 0, :3] + rng.uniform(-0.5, 0.5, (30, 3))
    coords[1, :30] = gt[1, 0, :3] + rng.uniform(-0.5, 0.5, (30, 3))
    feats = rng.randn(b, n, 32).astype(np.float32)
    batch = {
        "point_coords": jnp.asarray(coords),
        "point_features": jnp.asarray(feats),
        "gt_boxes": jnp.asarray(gt),
    }
    variables = head.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = head.apply(variables, dict(batch), train=False)
    assert out["batch_box_preds"].shape == (b, n, 9)

    out_t, _ = head.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    labels = np.asarray(out_t["point_cls_labels"])
    assert (labels[0, :30] == 1).mean() > 0.5  # planted points are fg
    rot_cls = np.asarray(out_t["point_rot_cls_labels"])
    # sloped gt (pitch -0.2 < -0.1) → slope label 1 on its fg points
    assert (rot_cls[0][labels[0] > 0] == 1).all()
    # flat gt → slope label 0
    assert (rot_cls[1][labels[1] > 0] == 0).all()
    # bg points ignored (-1)
    assert (rot_cls[labels <= 0] == -1).all()
    # rot regression target = rotvec of the gt euler
    from scipy.spatial.transform import Rotation

    want = Rotation.from_euler("zyx", gt[0, 0, 6:9]).as_rotvec()
    got = np.asarray(out_t["point_rot_reg_labels"])[0][labels[0] > 0]
    np.testing.assert_allclose(got[0], want, atol=1e-4)

    coder = box_coder_utils.build_box_coder(
        "PointResidualCoder", use_mean_size=True,
        mean_size=[[3.9, 1.6, 1.56]],
    )
    loss, tb = point_head_box6d_loss(out_t, cfg, 1, coder)
    assert np.isfinite(float(loss))
    assert float(tb["point_loss_rot_reg"]) > 0


def test_det6d_dr_config_builds_and_runs(rng):
    """The det6d_dr_car.yaml D.R. ablation model runs fwd + loss."""
    from de6d_tpu.config import cfg_from_yaml_file, Config
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    cfg = cfg_from_yaml_file(
        "configs/slopedkitti_models/det6d_dr_car.yaml", Config()
    )
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES), point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
    )
    # shrink the backbone for CPU
    sa = cfg.MODEL["BACKBONE_3D"]["SA_CONFIG"]
    sa["NPOINT_LIST"] = [[64], [32], [16]][: len(sa["NPOINT_LIST"])]
    model = build_network(cfg.MODEL, num_class=1, dataset=spec)

    b, n = 1, 256
    pc = spec.point_cloud_range
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (b, n))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (b, n))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (b, n))
    gt = np.zeros((b, 2, 10), np.float32)
    gt[0, 0] = [10, 0, -1, 4.0, 1.6, 1.5, 0.3, -0.15, 0.0, 1]
    pts[0, :40, 0] = 10 + rng.uniform(-1.5, 1.5, 40)
    pts[0, :40, 1] = rng.uniform(-0.7, 0.7, 40)
    pts[0, :40, 2] = -1 + rng.uniform(-0.6, 0.6, 40)
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = model.apply(variables, dict(batch), train=False)
    assert out["batch_box_preds"].shape[-1] == 9
    out_t, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    loss, tb = model.get_training_loss(out_t)
    assert np.isfinite(float(loss))
