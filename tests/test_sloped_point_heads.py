"""7-DoF heads must train on 9-DoF (10-col) gts.

Sloped data (SlopedKittiDataset) and SlopeAug both deliver gt_boxes
with pitch/roll columns; 7-DoF heads (PointHeadBox, anchor heads, and
their RoI stages) must encode only their own code width — the
reference instead hard-asserts 8-col gts (point_head_template.py:69),
which would crash its own pointrcnn_slopeaug configuration, and its
anchor path would emit 9-wide targets against 7-wide conv predictions.
Guards the kitti_models/pointrcnn_slopeaug.yaml and the
slopedkitti_models/{pointrcnn,second,voxel_rcnn_car}.yaml paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize(
    "cfg_file",
    [
        "configs/kitti_models/pointrcnn_slopeaug.yaml",
        "configs/slopedkitti_models/pointrcnn.yaml",
    ],
)
def test_pointrcnn_trains_on_10col_gts(cfg_file):
    from de6d_tpu.config import Config, cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    cfg = cfg_from_yaml_file(cfg_file, Config())
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES), point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
    )
    sa = cfg.MODEL["BACKBONE_3D"]["SA_CONFIG"]
    sa["NPOINTS"] = [128, 64, 32, 16]
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), spec)

    rng = np.random.RandomState(0)
    b, n = 1, 512
    pc = spec.point_cloud_range
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (b, n))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (b, n))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (b, n))
    gt = np.zeros((b, 3, 10), np.float32)  # 9-DoF + class
    for g in range(3):
        gt[0, g] = [
            10 + 8 * g, -2 + 2 * g, -1, 3.9, 1.6, 1.56,
            0.4 * g, -0.1 * g, 0.02 * g, 1,
        ]
        pts[0, g * 60:(g + 1) * 60, 0] = gt[0, g, 0] + rng.uniform(
            -1.5, 1.5, 60
        )
        pts[0, g * 60:(g + 1) * 60, 1] = gt[0, g, 1] + rng.uniform(
            -0.7, 0.7, 60
        )
        pts[0, g * 60:(g + 1) * 60, 2] = -1 + rng.uniform(-0.6, 0.6, 60)
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    # reg labels must match the head's code width exactly
    code = out["point_reg_labels"].shape[-1]
    assert code == out["point_reg_preds"].shape[-1], (
        code, out["point_reg_preds"].shape,
    )
    loss, tb = model.get_training_loss(out)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize(
    "cfg_file",
    [
        "configs/slopedkitti_models/second.yaml",
        "configs/slopedkitti_models/voxel_rcnn_car.yaml",
    ],
)
def test_anchor_and_roi_models_train_on_10col_gts(cfg_file):
    """Anchor heads (and RoI stages) on sloped 9-DoF gts: reg targets
    must truncate to the coder width (7) instead of carrying the
    appended pitch/roll residuals into the smooth-L1 against 7-wide
    conv predictions."""
    from de6d_tpu.config import Config, cfg_from_yaml_file
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    cfg = cfg_from_yaml_file(cfg_file, Config())
    vs = (0.16, 0.16, 0.2)
    for p in cfg.DATA_CONFIG.get("DATA_PROCESSOR", []):
        if p.get("NAME") == "transform_points_to_voxels":
            vs = tuple(p["VOXEL_SIZE"])
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES), point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
        voxel_size=vs, max_voxels=4000, max_points_per_voxel=5,
    )
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), spec)
    rng = np.random.RandomState(0)
    b, n = 1, 1024
    pc = spec.point_cloud_range
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (b, n))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (b, n))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (b, n))
    gt = np.zeros((b, 3, 10), np.float32)
    for g in range(3):
        gt[0, g] = [
            10 + 8 * g, -2 + 2 * g, -1, 3.9, 1.6, 1.56,
            0.4 * g, -0.1 * g, 0.02 * g, 1,
        ]
        pts[0, g * 60:(g + 1) * 60, 0] = gt[0, g, 0] + rng.uniform(
            -1.5, 1.5, 60
        )
        pts[0, g * 60:(g + 1) * 60, 1] = gt[0, g, 1] + rng.uniform(
            -0.7, 0.7, 60
        )
        pts[0, g * 60:(g + 1) * 60, 2] = -1 + rng.uniform(-0.6, 0.6, 60)
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    assert (
        out["box_reg_targets"].shape[-1] == out["box_preds"].shape[-1]
    )
    loss, tb = model.get_training_loss(out)
    assert np.isfinite(float(loss))
