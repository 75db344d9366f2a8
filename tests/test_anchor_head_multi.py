"""AnchorHeadMulti + ATSS target assigner.

The ATSS test checks the jnp implementation against a direct numpy
transcription of the reference algorithm
(target_assigner/atss_target_assigner.py:77-141) on small random
problems.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from de6d_tpu.ops import iou3d
from de6d_tpu.utils import box_coder_utils


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def _rot_z(pts, ang):
    c, s = np.cos(ang), np.sin(ang)
    x = pts[..., 0] * c - pts[..., 1] * s
    y = pts[..., 0] * s + pts[..., 1] * c
    return np.stack([x, y, pts[..., 2]], -1)


def _atss_oracle(anchors, gt, gt_cls, topk, coder):
    """Numpy transcription of the reference assign_targets_single.

    Returns (labels, borderline): borderline anchors sit within float
    noise of the mean+std threshold — excluded from exact comparison.
    """
    n, m = anchors.shape[0], gt.shape[0]
    ious = np.array(iou3d.boxes_iou_bev(anchors[:, :7], gt[:, :7]))
    ious[ious <= 1e-4] = 0.0  # same floor as the jnp assigner
    dist = np.linalg.norm(
        anchors[:, None, :3] - gt[None, :, :3], axis=-1
    )
    topk_idx = np.argsort(dist, axis=0)[:topk]  # (K, M)
    cand = ious[topk_idx, np.arange(m)]  # (K, M)
    thresh = cand.mean(0) + cand.std(0, ddof=1) + 1e-6
    is_pos = cand >= thresh[None]
    borderline = np.zeros(n, bool)
    near = np.abs(cand - thresh[None]) < 1e-5
    borderline[topk_idx.reshape(-1)[near.reshape(-1)]] = True
    # distance ties at the k-th candidate make topk membership
    # backend-dependent — exclude anchors near the k-th distance
    kth = np.sort(dist, axis=0)[topk - 1]  # (M,)
    tie = np.abs(dist - kth[None, :]) < 1e-4
    borderline[np.any(tie, axis=1)] = True

    ca = anchors[topk_idx.reshape(-1)]
    gb = np.tile(gt, (topk, 1))
    local = _rot_z(ca[:, :3] - gb[:, :3], -gb[:, 6])
    lw = gb[:, 3:5][:, [1, 0]]
    in_gt = (
        (local[:, :2] <= lw / 2) & (local[:, :2] >= -lw / 2)
    ).all(-1).reshape(-1, m)
    is_pos = is_pos & in_gt

    INF = -1e30
    ious_inf = np.full((m * n,), INF)
    glob = topk_idx + np.arange(m)[None, :] * n
    idx = glob.reshape(-1)[is_pos.reshape(-1)]
    ious_inf[idx] = ious.T.reshape(-1)[idx]
    ious_inf = ious_inf.reshape(m, n).T

    a2g_val = ious_inf.max(1)
    a2g_idx = ious_inf.argmax(1)
    best = ious.argmax(0)
    a2g_idx[best] = np.arange(m)
    a2g_val[best] = ious.max(0)

    labels = gt_cls[a2g_idx].copy()
    labels[a2g_val == INF] = 0
    return labels, borderline


def test_atss_matches_reference_oracle(rng):
    from de6d_tpu.models.dense_heads.atss_assigner import (
        assign_targets_atss,
    )

    coder = box_coder_utils.build_box_coder("ResidualCoder")
    n, m = 120, 4
    anchors = np.zeros((n, 7), np.float32)
    anchors[:, 0] = rng.uniform(0, 40, n)
    anchors[:, 1] = rng.uniform(-20, 20, n)
    anchors[:, 2] = -1.0
    anchors[:, 3:6] = [3.9, 1.6, 1.56]
    anchors[:, 6] = rng.choice([0.0, 1.57], n)

    gt = np.zeros((m, 8), np.float32)
    gt[:, 0] = rng.uniform(5, 35, m)
    gt[:, 1] = rng.uniform(-15, 15, m)
    gt[:, 2] = -1.0
    gt[:, 3:6] = [4.2, 1.7, 1.5]
    gt[:, 6] = rng.uniform(-np.pi, np.pi, m)
    gt[:, 7] = rng.randint(1, 3, m)

    out = assign_targets_atss(
        jnp.asarray(anchors), jnp.asarray(gt[None]), topk=9,
        box_coder=coder,
    )
    got = np.asarray(out["box_cls_labels"][0])
    want, borderline = _atss_oracle(
        anchors, gt[:, :7], gt[:, 7].astype(np.int32), 9, coder
    )
    np.testing.assert_array_equal(got[~borderline], want[~borderline])
    # positives must have reg targets + weights
    pos = got > 0
    assert pos.any()
    assert np.all(np.asarray(out["reg_weights"][0])[pos] == 1.0)
    assert np.any(np.asarray(out["box_reg_targets"][0])[pos] != 0)


def test_atss_empty_gts(rng):
    from de6d_tpu.models.dense_heads.atss_assigner import (
        assign_targets_atss,
    )

    coder = box_coder_utils.build_box_coder("ResidualCoder")
    anchors = np.zeros((32, 7), np.float32)
    anchors[:, 3:6] = 1.0
    gt = np.zeros((1, 5, 8), np.float32)
    out = assign_targets_atss(
        jnp.asarray(anchors), jnp.asarray(gt), topk=5, box_coder=coder
    )
    assert np.all(np.asarray(out["box_cls_labels"]) == 0)
    assert np.all(np.asarray(out["reg_weights"]) == 0)


def _multi_cfg(use_sep_reg):
    cfg = {
        "NAME": "AnchorHeadMulti",
        "CLASS_AGNOSTIC": False,
        "SHARED_CONV_NUM_FILTER": 16,
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539,
        "DIR_LIMIT_OFFSET": 0.0,
        "NUM_DIR_BINS": 2,
        "RPN_HEAD_CFGS": [
            {"HEAD_CLS_NAME": ["Car"]},
            {"HEAD_CLS_NAME": ["Pedestrian", "Cyclist"]},
        ],
        "ANCHOR_GENERATOR_CONFIG": [
            {
                "class_name": "Car",
                "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False,
                "feature_map_stride": 2,
                "matched_threshold": 0.6,
                "unmatched_threshold": 0.45,
            },
            {
                "class_name": "Pedestrian",
                "anchor_sizes": [[0.8, 0.6, 1.73]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-0.6],
                "align_center": False,
                "feature_map_stride": 2,
                "matched_threshold": 0.5,
                "unmatched_threshold": 0.35,
            },
            {
                "class_name": "Cyclist",
                "anchor_sizes": [[1.76, 0.6, 1.73]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-0.6],
                "align_center": False,
                "feature_map_stride": 2,
                "matched_threshold": 0.5,
                "unmatched_threshold": 0.35,
            },
        ],
        "TARGET_ASSIGNER_CONFIG": {
            "NAME": "AxisAlignedTargetAssigner",
            "POS_FRACTION": -1.0,
            "SAMPLE_SIZE": 512,
            "MATCH_HEIGHT": False,
            "BOX_CODER": "ResidualCoder",
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "pos_cls_weight": 1.0,
                "neg_cls_weight": 2.0,
                "cls_weight": 1.0,
                "loc_weight": 0.25,
                "dir_weight": 0.2,
                "code_weights": [1.0] * 7,
            }
        },
    }
    if use_sep_reg:
        cfg["SEPARATE_REG_CONFIG"] = {
            "NUM_MIDDLE_CONV": 1,
            "NUM_MIDDLE_FILTER": 8,
            "REG_LIST": ["reg:2", "height:1", "size:3", "angle:1"],
        }
    return cfg


@pytest.mark.parametrize("use_sep_reg", [False, True])
def test_anchor_head_multi_forward_and_loss(rng, use_sep_reg):
    import jax

    from de6d_tpu.models.dense_heads.anchor_head_multi import (
        AnchorHeadMulti,
    )
    from de6d_tpu.models.dense_heads.anchor_head import anchor_head_loss

    cfg = _multi_cfg(use_sep_reg)
    grid = (32, 32, 1)
    head = AnchorHeadMulti(
        model_cfg=cfg, num_class=3,
        class_names=("Car", "Pedestrian", "Cyclist"),
        grid_size=grid, point_cloud_range=(0, -16, -3, 32, 16, 1),
    )
    x = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    gt = np.zeros((2, 3, 8), np.float32)
    gt[0, 0] = [10, 2, -1, 3.9, 1.6, 1.56, 0.2, 1]
    gt[0, 1] = [20, -4, -0.6, 0.8, 0.6, 1.73, 0.0, 2]
    gt[1, 0] = [15, 5, -0.6, 1.76, 0.6, 1.73, -0.4, 3]
    batch = {"spatial_features_2d": x, "gt_boxes": jnp.asarray(gt)}

    variables = head.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = head.apply(variables, dict(batch), train=False)
    a_tot = 16 * 16 * 2 + 16 * 16 * 4  # car head + ped/cyc head
    assert out["batch_box_preds"].shape == (2, a_tot, 7)
    assert out["batch_cls_preds"].shape == (2, a_tot, 3)
    assert out["anchors"].shape[0] == a_tot

    out_t, _ = head.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    loss, tb = anchor_head_loss(
        out_t, cfg["LOSS_CONFIG"], num_class=3, dir_cfg=cfg
    )
    assert np.isfinite(float(loss))
    # some positives were assigned
    assert int((np.asarray(out_t["box_cls_labels"]) > 0).sum()) > 0


def test_anchor_head_multi_with_atss(rng):
    import jax

    from de6d_tpu.models.dense_heads.anchor_head_multi import (
        AnchorHeadMulti,
    )

    cfg = _multi_cfg(False)
    cfg["TARGET_ASSIGNER_CONFIG"] = {
        "NAME": "ATSSTargetAssigner",
        "TOPK": 9,
        "MATCH_HEIGHT": False,
        "BOX_CODER": "ResidualCoder",
    }
    head = AnchorHeadMulti(
        model_cfg=cfg, num_class=3,
        class_names=("Car", "Pedestrian", "Cyclist"),
        grid_size=(32, 32, 1), point_cloud_range=(0, -16, -3, 32, 16, 1),
    )
    x = jnp.asarray(rng.randn(1, 16, 16, 24).astype(np.float32))
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [10, 2, -1, 3.9, 1.6, 1.56, 0.2, 1]
    batch = {"spatial_features_2d": x, "gt_boxes": jnp.asarray(gt)}
    variables = head.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out_t, _ = head.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    labels = np.asarray(out_t["box_cls_labels"])
    assert (labels > 0).sum() > 0
    assert np.isfinite(np.asarray(out_t["box_reg_targets"])).all()
