"""Smoke e2e tests for the wider detector zoo: CenterPoint,
SECOND-IoU, Part-A2, Voxel-RCNN (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.config import Config
from de6d_tpu.models import build_network
from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

import model_fixtures

SPEC = DatasetSpec(
    class_names=("Car",),
    point_feature_dim=4,
    point_cloud_range=(0.0, -6.4, -3.0, 12.8, 6.4, 1.0),
    voxel_size=(0.1, 0.1, 0.1),
    max_voxels=1500,
    max_points_per_voxel=5,
)


def base_voxel_cfg(name):
    base, _ = model_fixtures.tiny_pointpillar_cfg(num_class=1)
    cfg = Config(base.to_dict())
    cfg["NAME"] = name
    cfg["VFE"] = {"NAME": "MeanVFE"}
    cfg["BACKBONE_3D"] = {
        "NAME": "VoxelBackBone8x",
        "NUM_FILTERS": [8, 8, 16, 16, 16],
        "OUT_CHANNELS": 16,
    }
    cfg["MAP_TO_BEV"] = {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32}
    cfg["BACKBONE_2D"] = {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [1, 1],
        "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [32, 64],
        "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [32, 32],
    }
    cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"] = [
        dict(cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"][0])
    ]
    cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"][0]["feature_map_stride"] = 8
    return cfg


ROI_COMMON = {
    "NMS_CONFIG": {
        "TRAIN": {
            "NMS_THRESH": 0.8, "NMS_PRE_MAXSIZE": 128,
            "NMS_POST_MAXSIZE": 32,
        },
        "TEST": {
            "NMS_THRESH": 0.7, "NMS_PRE_MAXSIZE": 128,
            "NMS_POST_MAXSIZE": 16,
        },
    },
    "TARGET_CONFIG": {
        "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55,
    },
    "LOSS_CONFIG": {
        "CORNER_LOSS_REGULARIZATION": False,
        "LOSS_WEIGHTS": {
            "rcnn_cls_weight": 1.0,
            "rcnn_reg_weight": 1.0,
            "code_weights": [1.0] * 7,
        },
    },
}


def run_model(cfg, rng, needs_sampling_rng=True):
    model = build_network(cfg, num_class=1, dataset=SPEC)
    batch = model_fixtures.random_batch(
        rng, SPEC, batch_size=2, n_points=768, n_gt=3
    )
    rngs = {"params": jax.random.PRNGKey(0)}
    if needs_sampling_rng:
        rngs["sampling"] = jax.random.PRNGKey(1)
    variables = model.init(rngs, dict(batch), train=True)
    apply_rngs = (
        {"sampling": jax.random.PRNGKey(2)} if needs_sampling_rng else {}
    )
    out, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"],
        rngs=apply_rngs,
    )
    loss, tb = model.get_training_loss(out)
    assert np.isfinite(float(loss)), tb
    ev = model.apply(variables, dict(batch), train=False)
    assert "batch_box_preds" in ev
    return tb, ev


def test_centerpoint(rng):
    cfg = base_voxel_cfg("CenterPoint")
    cfg["DENSE_HEAD"] = {
        "NAME": "CenterHead",
        "CLASS_AGNOSTIC": False,
        "CLASS_NAMES_EACH_HEAD": [["Car"]],
        "SHARED_CONV_CHANNEL": 16,
        "FEATURE_MAP_STRIDE": 8,
        "TARGET_ASSIGNER_CONFIG": {
            "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2,
        },
        "POST_CONFIG": {"MAX_OBJ_PER_SAMPLE": 50},
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "cls_weight": 1.0,
                "loc_weight": 2.0,
                "code_weights": [1.0] * 8,
            }
        },
    }
    tb, ev = run_model(cfg, rng, needs_sampling_rng=False)
    assert "center_loss" in tb
    assert ev["batch_box_preds"].shape[-1] == 7


def test_second_iou(rng):
    cfg = base_voxel_cfg("SECONDNetIoU")
    cfg["ROI_HEAD"] = dict(ROI_COMMON)
    cfg["ROI_HEAD"]["NAME"] = "SECONDHead"
    cfg["ROI_HEAD"]["GRID_SIZE"] = 5
    cfg["ROI_HEAD"]["IOU_FC"] = [32]
    cfg["ROI_HEAD"]["LOSS_CONFIG"] = {
        "LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0}
    }
    tb, ev = run_model(cfg, rng, needs_sampling_rng=False)
    assert "rcnn_loss_iou" in tb


def test_parta2(rng):
    cfg = base_voxel_cfg("PartA2Net")
    cfg["BACKBONE_3D"]["NAME"] = "UNetV2"
    cfg["POINT_HEAD"] = {
        "NAME": "PointIntraPartOffsetHead",
        "CLASS_AGNOSTIC": True,
        "CLS_FC": [16],
        "PART_FC": [16],
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "point_cls_weight": 1.0, "point_part_weight": 1.0,
            }
        },
    }
    cfg["ROI_HEAD"] = dict(ROI_COMMON)
    cfg["ROI_HEAD"]["NAME"] = "PartA2FCHead"
    cfg["ROI_HEAD"]["ROI_AWARE_POOL"] = {"POOL_SIZE": 4}
    cfg["ROI_HEAD"]["SHARED_FC"] = [32]
    cfg["ROI_HEAD"]["CLS_FC"] = [16]
    cfg["ROI_HEAD"]["REG_FC"] = [16]
    tb, ev = run_model(cfg, rng)
    assert "part_loss_seg" in tb and "rcnn_loss" in tb


def test_voxel_rcnn(rng):
    cfg = base_voxel_cfg("VoxelRCNN")
    cfg["ROI_HEAD"] = dict(ROI_COMMON)
    cfg["ROI_HEAD"]["NAME"] = "VoxelRCNNHead"
    cfg["ROI_HEAD"]["ROI_GRID_POOL"] = {
        "GRID_SIZE": 4,
        "FEATURES_SOURCE": ["x_conv3", "x_conv4"],
        "POOL_MLPS": {"x_conv3": [16], "x_conv4": [16]},
    }
    cfg["ROI_HEAD"]["SHARED_FC"] = [32]
    cfg["ROI_HEAD"]["CLS_FC"] = [16]
    cfg["ROI_HEAD"]["REG_FC"] = [16]
    tb, ev = run_model(cfg, rng)
    assert "rcnn_loss" in tb
