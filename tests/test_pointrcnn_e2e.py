"""PointRCNN two-stage e2e (tiny shapes, CPU): PointNet2MSG backbone
with FP → PointHeadBox → proposal NMS → RoI point pool → rcnn head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.config import Config
from de6d_tpu.models import build_network
from de6d_tpu.models.detectors.detector3d_template import DatasetSpec


def tiny_pointrcnn_cfg():
    return Config(
        {
            "NAME": "PointRCNN",
            "BACKBONE_3D": {
                "NAME": "PointNet2MSG",
                "SA_CONFIG": {
                    "NPOINTS": [128, 64],
                    "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
                    "NSAMPLE": [[8, 16], [8, 16]],
                    "MLPS": [
                        [[16, 16], [16, 16]],
                        [[32, 32], [32, 32]],
                    ],
                },
                "FP_MLPS": [[32, 32], [32, 32]],
            },
            "POINT_HEAD": {
                "NAME": "PointHeadBox",
                "CLASS_AGNOSTIC": False,
                "USE_BN": True,
                "CLS_FC": [32],
                "REG_FC": [32],
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
                        "code_weights": [1.0] * 8,
                    }
                },
            },
            "ROI_HEAD": {
                "NAME": "PointRCNNHead",
                "CLASS_AGNOSTIC": True,
                "USE_BN": True,
                "ROI_POINT_POOL": {
                    "NUM_SAMPLED_POINTS": 64,
                    "DEPTH_NORMALIZER": 70.0,
                },
                "XYZ_UP_LAYER": [16, 16],
                "SA_CONFIG": {
                    "NPOINTS": [32, -1],
                    "RADIUS": [0.5, 100.0],
                    "NSAMPLE": [8, 16],
                    "MLPS": [[16, 16], [16, 32]],
                },
                "CLS_FC": [16],
                "REG_FC": [16],
                "NMS_CONFIG": {
                    "TRAIN": {
                        "NMS_THRESH": 0.8,
                        "NMS_PRE_MAXSIZE": 128,
                        "NMS_POST_MAXSIZE": 32,
                    },
                    "TEST": {
                        "NMS_THRESH": 0.85,
                        "NMS_PRE_MAXSIZE": 128,
                        "NMS_POST_MAXSIZE": 16,
                    },
                },
                "TARGET_CONFIG": {
                    "ROI_PER_IMAGE": 16,
                    "FG_RATIO": 0.5,
                    "REG_FG_THRESH": 0.55,
                },
                "LOSS_CONFIG": {
                    "CORNER_LOSS_REGULARIZATION": True,
                    "LOSS_WEIGHTS": {
                        "rcnn_cls_weight": 1.0,
                        "rcnn_reg_weight": 1.0,
                        "rcnn_corner_weight": 1.0,
                        "code_weights": [1.0] * 7,
                    },
                },
            },
            "POST_PROCESSING": {
                "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                "SCORE_THRESH": 0.1,
                "NMS_CONFIG": {
                    "NMS_TYPE": "nms_gpu",
                    "NMS_THRESH": 0.1,
                    "NMS_PRE_MAXSIZE": 32,
                    "NMS_POST_MAXSIZE": 16,
                },
            },
        }
    )


def test_pointrcnn_two_stage(rng):
    cfg = tiny_pointrcnn_cfg()
    spec = DatasetSpec(
        class_names=("Car",),
        point_feature_dim=4,
        point_cloud_range=(0.0, -16.0, -3.0, 32.0, 16.0, 1.0),
    )
    model = build_network(cfg, num_class=1, dataset=spec)
    b, n = 2, 256
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0, 32, (b, n))
    pts[..., 1] = rng.uniform(-16, 16, (b, n))
    pts[..., 2] = rng.uniform(-2, 1, (b, n))
    gt = np.zeros((b, 3, 8), np.float32)
    gt[..., 0] = rng.uniform(5, 27, (b, 3))
    gt[..., 1] = rng.uniform(-10, 10, (b, 3))
    gt[..., 3:6] = [4.0, 1.6, 1.5]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, 3))
    gt[..., 7] = 1
    for bi in range(b):
        for gi in range(3):
            sl = slice(gi * 30, gi * 30 + 30)
            pts[bi, sl, 0] = gt[bi, gi, 0] + rng.uniform(-1.5, 1.5, 30)
            pts[bi, sl, 1] = gt[bi, gi, 1] + rng.uniform(-0.7, 0.7, 30)
            pts[bi, sl, 2] = gt[bi, gi, 2] + rng.uniform(-0.6, 0.6, 30)
    batch = {
        "points": pts,
        "points_mask": np.ones((b, n), bool),
        "gt_boxes": gt,
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        dict(batch), train=True,
    )
    out, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"],
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    assert "roi_targets_dict" in out
    loss, tb = model.get_training_loss(out)
    assert np.isfinite(float(loss))
    assert "rcnn_loss" in tb and "point_loss_cls" in tb

    ev = model.apply(variables, dict(batch), train=False)
    assert ev["batch_box_preds"].shape == (b, 16, 7)
    assert ev["batch_cls_preds"].shape == (b, 16, 1)
