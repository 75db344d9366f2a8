"""Exact IA-SSD: backbone layering (sampling-only stage, vote layer,
ctr aggregation), head targets and the full loss stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(9)


def _tiny_iassd_cfg():
    return {
        "NAME": "IASSD",
        "BACKBONE_3D": {
            "NAME": "IASSD_Backbone",
            "SA_CONFIG": {
                "LAYER_TYPE": ["SA_Layer", "SA_Layer", "SA_Layer",
                               "Vote_Layer", "SA_Layer"],
                "CTR_INDEX": [-1, -1, -1, -1, 4],
                "LAYER_INPUT": [0, 1, 2, 3, 2],
                "NPOINT_LIST": [[128], [64], [32], [-1], [-1]],
                "SAMPLE_RANGE_LIST": [[0, -1], [0, -1], [0, -1], [], []],
                "SAMPLE_METHOD_LIST": [["D-FPS"], ["D-FPS"],
                                       ["ctr_aware"], [], []],
                "RADIUS_LIST": [[0.5, 1.0], [1.0, 2.0], [], [], [2.0, 4.0]],
                "NSAMPLE_LIST": [[8, 8], [8, 8], [], [], [8, 8]],
                "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]], [],
                         [16], [[16, 32], [16, 32]]],
                "AGGREGATION_MLPS": [[16], [32], [], [], [32]],
                "CONFIDENCE_MLPS": [[8], [8], [], [], []],
                "DILATED_GROUP": [False] * 5,
                "MAX_TRANSLATE_RANGE": [3.0, 3.0, 2.0],
            },
        },
        "POINT_HEAD": {
            "NAME": "IASSD_Head",
            "CLASS_AGNOSTIC": False,
            "USE_BN": True,
            "CLS_FC": [16],
            "REG_FC": [16],
            "IOU_FC": [16],
            "TARGET_CONFIG": {
                "INS_AWARE_ASSIGN": True,
                "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                "BOX_CODER": "PointResidual_BinOri_Coder",
                "BOX_CODER_CONFIG": {
                    "angle_bin_num": 12,
                    "use_mean_size": True,
                    "mean_size": [[3.9, 1.6, 1.56]],
                },
                "ASSIGN_METHOD": {
                    "NAME": "extend_gt",
                    "ASSIGN_TYPE": "centers_origin",
                    "EXTRA_WIDTH": [1.0, 1.0, 1.0],
                    "FG_PC_IGNORE": False,
                },
            },
            "LOSS_CONFIG": {
                "LOSS_CLS": "WeightedClassificationLoss",
                "CENTERNESS_REGULARIZATION": True,
                "LOSS_INS": "WeightedClassificationLoss",
                "SAMPLE_METHOD_LIST": [["D-FPS"], ["D-FPS"],
                                       ["ctr_aware"], []],
                "LOSS_VOTE_TYPE": "none",
                "CORNER_LOSS_REGULARIZATION": True,
                "IOU3D_REGULARIZATION": True,
                "LOSS_REG": "WeightedSmoothL1Loss",
                "LOSS_WEIGHTS": {
                    "vote_weight": 1.0,
                    "point_cls_weight": 1.0,
                    "point_box_weight": 1.0,
                    "corner_weight": 1.0,
                    "iou3d_weight": 1.0,
                    "dir_weight": 1.0,
                    "code_weights": [1.0] * 8,
                    "ins_aware_weight": [0, 1.0, 1.0],
                },
            },
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
            "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {
                "MULTI_CLASSES_NMS": False,
                "NMS_TYPE": "nms_gpu",
                "NMS_THRESH": 0.01,
                "NMS_PRE_MAXSIZE": 64,
                "NMS_POST_MAXSIZE": 16,
            },
        },
    }


def test_iassd_exact_forward_and_loss(rng):
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    spec = DatasetSpec(
        class_names=("Car",), point_feature_dim=4,
        point_cloud_range=(0, -20, -3, 40, 20, 1),
    )
    model = build_network(_tiny_iassd_cfg(), num_class=1, dataset=spec)
    b, n = 2, 256
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0, 40, (b, n))
    pts[..., 1] = rng.uniform(-20, 20, (b, n))
    pts[..., 2] = rng.uniform(-3, 1, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    gt = np.zeros((b, 2, 8), np.float32)
    gt[0, 0] = [10, 0, -1, 4.0, 1.6, 1.5, 0.3, 1]
    gt[1, 0] = [20, 5, -1, 4.0, 1.6, 1.5, -0.7, 1]
    # plant MOST points in the boxes so random-init sampling/voting
    # still lands centers in (extended) gts
    for s_ in range(b):
        k = 200
        pts[s_, :k, 0] = gt[s_, 0, 0] + rng.uniform(-1.8, 1.8, k)
        pts[s_, :k, 1] = gt[s_, 0, 1] + rng.uniform(-0.75, 0.75, k)
        pts[s_, :k, 2] = gt[s_, 0, 2] + rng.uniform(-0.7, 0.7, k)
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }

    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = model.apply(variables, dict(batch), train=False)
    nc = out["centers"].shape[1]
    assert out["centers"].shape == (b, nc, 3)
    assert out["ctr_offsets"].shape == (b, nc, 3)
    assert out["batch_box_preds"].shape[-1] == 7
    # sa_ins_preds: per-class logits where confidence MLPs configured
    sa_preds = [p for p in out["sa_ins_preds"] if p is not None]
    assert len(sa_preds) == 2
    assert all(p.shape[-1] == 1 for p in sa_preds)

    out_t, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    # pre-vote (centers_origin) extended assignment must find fg;
    # post-vote tight-box fg depends on untrained vote offsets
    assert int(
        (np.asarray(out_t["center_origin_cls_labels"]) > 0).sum()
    ) > 0
    loss, tb = model.get_training_loss(out_t)
    assert np.isfinite(float(loss))
    for k in ("center_origin_loss_reg", "center_loss_cls",
              "center_loss_box", "corner_loss_reg", "sa_loss_ins",
              "iou3d_loss_reg"):
        assert k in tb, k
        assert np.isfinite(float(tb[k])), k

    # gradient flows through the whole stack
    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            dict(batch), train=True, mutable=["batch_stats"],
        )
        l, _ = model.get_training_loss(o)
        return l

    g = jax.grad(loss_fn)(variables["params"])
    gn = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0
    ))
    assert np.isfinite(gn) and gn > 0


def test_iassd_shipped_config_builds(rng):
    from de6d_tpu.config import cfg_from_yaml_file, Config
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    cfg = cfg_from_yaml_file("configs/kitti_models/IA-SSD.yaml", Config())
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES), point_feature_dim=4,
        point_cloud_range=tuple(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
    )
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), spec)
    assert model is not None
