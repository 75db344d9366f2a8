"""Tiny model configs + synthetic batches for tests, the driver
entry points, and quick experiments (CPU-runnable shapes)."""

from __future__ import annotations

import numpy as np

from ..config import Config
from ..models.detectors.detector3d_template import DatasetSpec


def tiny_det6d_cfg():
    return Config(
        {
            "NAME": "Det6D",
            "BACKBONE_3D": {
                "NAME": "PointNet2FSMSG",
                "SA_CONFIG": {
                    "NPOINT_LIST": [[256], [128], [64]],
                    "SAMPLE_RANGE_LIST": [[[0, -1]], [[0, -1]], [[0, -1]]],
                    "SAMPLE_METHOD_LIST": [["d-fps"], ["s-fps"], ["s-fps"]],
                    "RADIUS": [[0.5, 1.0], [1.0, 2.0], [2.0, 4.0]],
                    "NSAMPLE": [[8, 16], [8, 16], [8, 16]],
                    "MLPS": [
                        [[16, 16], [16, 16]],
                        [[32, 32], [32, 32]],
                        [[32, 64], [32, 64]],
                    ],
                    "AGGREGATION_MLPS": [[32], [64], [64]],
                    "CONFIDENCE_MLPS": [[16], [16], []],
                    "WEIGHT_GAMMA": 1.0,
                    "DILATED_RADIUS_GROUP": True,
                    "USE_XYZ": True,
                },
            },
            "POINT_HEAD": {
                "NAME": "PointHeadBox6DVote",
                "CLASS_AGNOSTIC": False,
                "USE_BN": True,
                "SAMPLE_RANGE": [0, 32],
                "VOTE_CONFIG": {
                    "VOTE_FC": [32],
                    "MAX_TRANSLATION_RANGE": [3.0, 3.0, 2.0],
                },
                "SA_CONFIG": {
                    "RADIUS": [2.4, 4.8],
                    "NSAMPLE": [8, 16],
                    "MLPS": [[64, 64], [64, 96]],
                },
                "SHARED_FC": [64],
                "CLS_FC": [32],
                "REG_FC": [32],
                "TARGET_CONFIG": {
                    "ASSIGN_METHOD": "mask",
                    "GT_CENTRAL_RADIUS": 10.0,
                    "VOTE_EXTRA_WIDTH": [1.0, 1.0, 1.0],
                    "BOX_CODER": "PointBinResidual6DCoder",
                    "BOX_CODER_CONFIG": {
                        "use_mean_size": False,
                        "angle_bin_num": 12,
                        "ground_aware": True,
                        "threshold": 10,
                        "factor": 45,
                    },
                },
                "LOSS_CONFIG": {
                    "LOSS_CLS": "WeightedBinaryCrossEntropy_WithCenterness",
                    "LOSS_CLS_CONFIG": {
                        "centerness_min": 0.0, "centerness_max": 1.0,
                    },
                    "LOSS_REG": "WeightedSmoothL1Loss",
                    "AXIS_ALIGNED_IOU_LOSS_REGULARIZATION": True,
                    "CORNER_LOSS_REGULARIZATION": True,
                    "LOSS_SASA_CONFIG": {
                        "func": "BCE",
                        "layer_weights": [0.01, 0.1, 1.0],
                    },
                    "LOSS_WEIGHTS": {
                        "vote_reg_weight": 1.0,
                        "point_cls_weight": 1.0,
                        "point_offset_reg_weight": 1.0,
                        "point_angle_cls_weight": 0.2,
                        "point_angle_reg_weight": 1.0,
                        "point_pitch_cls_weight": 1.0,
                        "point_pitch_reg_weight": 1.0,
                        "point_iou_weight": 1.0,
                        "point_corner_weight": 1.0,
                    },
                },
            },
            "POST_PROCESSING": {
                "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                "SCORE_THRESH": 0.1,
                "NMS_CONFIG": {
                    "NMS_TYPE": "nms_gpu",
                    "NMS_THRESH": 0.01,
                    "NMS_PRE_MAXSIZE": 64,
                    "NMS_POST_MAXSIZE": 16,
                },
            },
        }
    )


def tiny_det6d_spec():
    return DatasetSpec(
        class_names=("Car",),
        point_feature_dim=4,
        point_cloud_range=(0.0, -16.0, -3.0, 32.0, 16.0, 4.0),
    )


def det6d_synthetic_batch(rng, spec, batch_size=2, n_points=512, n_gt=4):
    b, n = batch_size, n_points
    pc = spec.point_cloud_range
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (b, n))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (b, n))
    pts[..., 2] = rng.uniform(-2, 2, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    gt = np.zeros((b, n_gt, 10), np.float32)
    gt[..., 0] = rng.uniform(pc[0] + 5, pc[3] - 5, (b, n_gt))
    gt[..., 1] = rng.uniform(pc[1] + 6, pc[4] - 6, (b, n_gt))
    gt[..., 2] = rng.uniform(-1, 0.5, (b, n_gt))
    gt[..., 3] = rng.uniform(3.5, 4.5, (b, n_gt))
    gt[..., 4] = rng.uniform(1.5, 1.8, (b, n_gt))
    gt[..., 5] = rng.uniform(1.4, 1.7, (b, n_gt))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, n_gt))
    gt[..., 7] = rng.uniform(-0.4, 0.1, (b, n_gt))
    gt[..., 9] = 1
    gt[:, -1] = 0
    for bi in range(b):
        for gi in range(n_gt - 1):
            sl = slice(gi * 40, gi * 40 + 40)
            pts[bi, sl, 0] = gt[bi, gi, 0] + rng.uniform(-1.5, 1.5, 40)
            pts[bi, sl, 1] = gt[bi, gi, 1] + rng.uniform(-0.7, 0.7, 40)
            pts[bi, sl, 2] = gt[bi, gi, 2] + rng.uniform(-0.6, 0.6, 40)
    return {
        "points": pts,
        "points_mask": np.ones((b, n), bool),
        "gt_boxes": gt,
    }
