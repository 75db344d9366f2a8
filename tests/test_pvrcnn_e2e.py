"""PV-RCNN e2e (tiny, CPU): sparse backbone → VSA keypoints →
anchor head + keypoint seg + RoI grid pooling."""

import jax
import jax.numpy as jnp
import numpy as np

from de6d_tpu.config import Config
from de6d_tpu.models import build_network
from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

import model_fixtures


def test_pvrcnn_two_stage(rng):
    base, _ = model_fixtures.tiny_pointpillar_cfg(num_class=1)
    cfg = Config(base.to_dict())
    cfg["NAME"] = "PVRCNN"
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
    cfg["PFE"] = {
        "NAME": "VoxelSetAbstraction",
        "NUM_KEYPOINTS": 128,
        "NUM_OUTPUT_FEATURES": 32,
        "SAMPLE_METHOD": "FPS",
        "FEATURES_SOURCE": ["bev", "raw_points", "x_conv3"],
        "SA_LAYER": {
            "raw_points": {
                "MLPS": [[8, 8], [8, 8]],
                "POOL_RADIUS": [0.4, 0.8],
                "NSAMPLE": [8, 8],
            },
            "x_conv3": {
                "DOWNSAMPLE_FACTOR": 4,
                "MLPS": [[16, 16], [16, 16]],
                "POOL_RADIUS": [1.2, 2.4],
                "NSAMPLE": [8, 8],
            },
        },
    }
    cfg["POINT_HEAD"] = {
        "NAME": "PointHeadSimple",
        "CLS_FC": [32],
        "CLASS_AGNOSTIC": True,
        "USE_POINT_FEATURES_BEFORE_FUSION": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0}},
    }
    cfg["ROI_HEAD"] = {
        "NAME": "PVRCNNHead",
        "CLASS_AGNOSTIC": True,
        "USE_BN": True,
        "SHARED_FC": [32],
        "CLS_FC": [16],
        "REG_FC": [16],
        "ROI_GRID_POOL": {
            "GRID_SIZE": 4,
            "MLPS": [[8, 8], [8, 8]],
            "POOL_RADIUS": [0.8, 1.6],
            "NSAMPLE": [8, 8],
        },
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
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {
                "rcnn_cls_weight": 1.0,
                "rcnn_reg_weight": 1.0,
                "rcnn_corner_weight": 1.0,
                "code_weights": [1.0] * 7,
            },
        },
    }
    spec = DatasetSpec(
        class_names=("Car",),
        point_feature_dim=4,
        point_cloud_range=(0.0, -6.4, -3.0, 12.8, 6.4, 1.0),
        voxel_size=(0.1, 0.1, 0.1),
        max_voxels=1500,
        max_points_per_voxel=5,
    )
    model = build_network(cfg, num_class=1, dataset=spec)
    batch = model_fixtures.random_batch(
        rng, spec, batch_size=2, n_points=768, n_gt=3
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        dict(batch), train=True,
    )
    out, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"],
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    loss, tb = model.get_training_loss(out)
    assert np.isfinite(float(loss))
    for k in ("rpn_loss_cls", "point_loss_cls", "rcnn_loss"):
        assert k in tb, k

    ev = model.apply(variables, dict(batch), train=False)
    assert ev["batch_box_preds"].shape == (2, 16, 7)
