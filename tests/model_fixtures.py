"""Shared tiny-model fixtures for end-to-end tests (CPU-runnable)."""

import numpy as np

from de6d_tpu.config import Config
from de6d_tpu.models.detectors.detector3d_template import DatasetSpec


def tiny_pointpillar_cfg(num_class=3):
    classes = ["Car", "Pedestrian", "Cyclist"][:num_class]
    anchor_cfgs = []
    defaults = {
        "Car": ([3.9, 1.6, 1.56], -1.78, 0.6, 0.45),
        "Pedestrian": ([0.8, 0.6, 1.73], -0.6, 0.5, 0.35),
        "Cyclist": ([1.76, 0.6, 1.73], -0.6, 0.5, 0.35),
    }
    for name in classes:
        size, h, m, u = defaults[name]
        anchor_cfgs.append(
            {
                "class_name": name,
                "anchor_sizes": [size],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [h],
                "align_center": False,
                "feature_map_stride": 2,
                "matched_threshold": m,
                "unmatched_threshold": u,
            }
        )
    model_cfg = Config(
        {
            "NAME": "PointPillar",
            "VFE": {
                "NAME": "PillarVFE",
                "WITH_DISTANCE": False,
                "USE_ABSLOTE_XYZ": True,
                "USE_NORM": True,
                "NUM_FILTERS": [32],
            },
            "MAP_TO_BEV": {
                "NAME": "PointPillarScatter",
                "NUM_BEV_FEATURES": 32,
            },
            "BACKBONE_2D": {
                "NAME": "BaseBEVBackbone",
                "LAYER_NUMS": [1, 1],
                "LAYER_STRIDES": [2, 2],
                "NUM_FILTERS": [32, 64],
                "UPSAMPLE_STRIDES": [1, 2],
                "NUM_UPSAMPLE_FILTERS": [32, 32],
            },
            "DENSE_HEAD": {
                "NAME": "AnchorHeadSingle",
                "CLASS_AGNOSTIC": False,
                "USE_DIRECTION_CLASSIFIER": True,
                "DIR_OFFSET": 0.78539,
                "DIR_LIMIT_OFFSET": 0.0,
                "NUM_DIR_BINS": 2,
                "ANCHOR_GENERATOR_CONFIG": anchor_cfgs,
                "TARGET_ASSIGNER_CONFIG": {
                    "NAME": "AxisAlignedTargetAssigner",
                    "POS_FRACTION": -1.0,
                    "SAMPLE_SIZE": 512,
                    "NORM_BY_NUM_EXAMPLES": False,
                    "MATCH_HEIGHT": False,
                    "BOX_CODER": "ResidualCoder",
                },
                "LOSS_CONFIG": {
                    "LOSS_WEIGHTS": {
                        "cls_weight": 1.0,
                        "loc_weight": 2.0,
                        "dir_weight": 0.2,
                        "code_weights": [1.0] * 7,
                    }
                },
            },
            "POST_PROCESSING": {
                "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                "SCORE_THRESH": 0.1,
                "NMS_CONFIG": {
                    "MULTI_CLASSES_NMS": False,
                    "NMS_TYPE": "nms_gpu",
                    "NMS_THRESH": 0.01,
                    "NMS_PRE_MAXSIZE": 256,
                    "NMS_POST_MAXSIZE": 32,
                },
            },
        }
    )
    spec = DatasetSpec(
        class_names=tuple(classes),
        point_feature_dim=4,
        point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
        voxel_size=(0.16, 0.16, 4.0),
        max_voxels=2000,
        max_points_per_voxel=16,
    )
    return model_cfg, spec


def random_batch(rng, spec, batch_size=2, n_points=2048, n_gt=5,
                 gt_ndim=8):
    pts = np.zeros((batch_size, n_points, spec.point_feature_dim), np.float32)
    pc = spec.point_cloud_range
    pts[..., 0] = rng.uniform(pc[0], pc[3], (batch_size, n_points))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (batch_size, n_points))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (batch_size, n_points))
    pts[..., 3] = rng.uniform(0, 1, (batch_size, n_points))
    mask = np.ones((batch_size, n_points), bool)
    mask[:, -100:] = False

    gt = np.zeros((batch_size, n_gt, gt_ndim), np.float32)
    gt[..., 0] = rng.uniform(pc[0] + 2, pc[3] - 2, (batch_size, n_gt))
    gt[..., 1] = rng.uniform(pc[1] + 2, pc[4] - 2, (batch_size, n_gt))
    gt[..., 2] = rng.uniform(-1.5, 0.0, (batch_size, n_gt))
    gt[..., 3] = rng.uniform(3.0, 4.5, (batch_size, n_gt))
    gt[..., 4] = rng.uniform(1.4, 1.8, (batch_size, n_gt))
    gt[..., 5] = rng.uniform(1.3, 1.8, (batch_size, n_gt))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (batch_size, n_gt))
    gt[..., -1] = rng.randint(1, 4, (batch_size, n_gt))
    # pad last gt row to zero (tests padded-gt handling)
    gt[:, -1] = 0
    return {
        "points": pts,
        "points_mask": mask,
        "gt_boxes": gt,
    }
