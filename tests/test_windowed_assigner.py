"""Windowed axis-aligned assigner == dense assigner, bit-for-bit.

The windowed fast path (assign_targets_windowed) replaces the dense
(A, M) IoU matrix with per-gt gathered windows plus an analytic
out-of-window base. These tests drive both implementations on the same
scenes — multi-class, zero-padded gts, empty samples, boundary
centers, duplicate/overlapping boxes — and assert every output array
is identical.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from de6d_tpu.models.dense_heads.anchor_generator import generate_anchors
from de6d_tpu.models.dense_heads.axis_aligned_assigner import (
    assign_targets, assign_targets_windowed, choose_window_cells,
)
from de6d_tpu.utils import box_coder_utils

PC_RANGE = [0.0, -19.84, -3.0, 34.56, 19.84, 1.0]
GRID = (216, 248, 1)  # voxel grid; feature stride 2 → 108x124 anchors

ANCHOR_CFG = [
    {
        "class_name": "Car",
        "anchor_sizes": [[3.9, 1.6, 1.56]],
        "anchor_rotations": [0, 1.57],
        "anchor_bottom_heights": [-1.78],
        "feature_map_stride": 2,
        "matched_threshold": 0.6,
        "unmatched_threshold": 0.45,
    },
    {
        "class_name": "Pedestrian",
        "anchor_sizes": [[0.8, 0.6, 1.73]],
        "anchor_rotations": [0, 1.57],
        "anchor_bottom_heights": [-0.6],
        "feature_map_stride": 2,
        "matched_threshold": 0.5,
        "unmatched_threshold": 0.35,
    },
]


def _setup():
    anchors, groups, matched, unmatched, a_loc = generate_anchors(
        ANCHOR_CFG, GRID, PC_RANGE
    )
    ny, nx = anchors.shape[:2]
    flat = anchors.reshape(-1, anchors.shape[-1])
    tiled = (
        np.tile(groups, ny * nx),
        np.tile(matched, ny * nx),
        np.tile(unmatched, ny * nx),
    )
    coder = box_coder_utils.build_box_coder("ResidualCoder")
    return anchors, flat, groups, matched, unmatched, tiled, coder


def _random_scene(rng, m, n_valid, cls_choices=(1, 2)):
    gt = np.zeros((m, 8), np.float32)
    for i in range(n_valid):
        c = rng.choice(cls_choices)
        if c == 1:
            size = np.array([3.9, 1.6, 1.56]) * rng.uniform(0.8, 1.3, 3)
        else:
            size = np.array([0.8, 0.6, 1.73]) * rng.uniform(0.8, 1.3, 3)
        gt[i, 0] = rng.uniform(PC_RANGE[0] + 1, PC_RANGE[3] - 1)
        gt[i, 1] = rng.uniform(PC_RANGE[1] + 1, PC_RANGE[4] - 1)
        gt[i, 2] = rng.uniform(-1.5, 0.0)
        gt[i, 3:6] = size
        gt[i, 6] = rng.uniform(-np.pi, np.pi)
        gt[i, 7] = c
    return gt


def _assert_equal(dense, windowed):
    for k in ("box_cls_labels", "box_reg_targets", "reg_weights"):
        np.testing.assert_array_equal(
            np.asarray(dense[k]), np.asarray(windowed[k]), err_msg=k
        )


@pytest.mark.parametrize("method", ["loop", "scatter"])
@pytest.mark.parametrize("match_height", [False, True])
def test_windowed_equals_dense_random(match_height, method):
    anchors, flat, groups, matched, unmatched, tiled, coder = _setup()
    w = choose_window_cells(anchors)
    rng = np.random.RandomState(0)
    gt = np.stack(
        [
            _random_scene(rng, 12, 9),
            _random_scene(rng, 12, 1),
            _random_scene(rng, 12, 0),  # empty sample → all labels 0
        ]
    )
    dense = assign_targets(
        jnp.asarray(flat), jnp.asarray(tiled[0]), jnp.asarray(tiled[1]),
        jnp.asarray(tiled[2]), jnp.asarray(gt), box_coder=coder,
        match_height=match_height,
    )
    windowed = assign_targets_windowed(
        jnp.asarray(anchors), jnp.asarray(groups), jnp.asarray(matched),
        jnp.asarray(unmatched), jnp.asarray(gt), box_coder=coder,
        match_height=match_height, window=w, method=method,
    )
    _assert_equal(dense, windowed)
    # sanity: the scene actually produces foreground anchors
    assert int(jnp.sum(dense["box_cls_labels"] > 0)) > 0


def test_windowed_equals_dense_adversarial():
    """Boundary centers, overlapping duplicates, same-cell multi-class,
    out-of-range centers — the tie/merge edge cases."""
    anchors, flat, groups, matched, unmatched, tiled, coder = _setup()
    w = choose_window_cells(anchors)
    gt = np.zeros((1, 10, 8), np.float32)
    boxes = [
        # two identical cars (gt_max tie across gts)
        (10.0, 5.0, -0.8, 3.9, 1.6, 1.56, 0.3, 1),
        (10.0, 5.0, -0.8, 3.9, 1.6, 1.56, 0.3, 1),
        # car and pedestrian sharing a cell
        (20.0, -10.0, -0.8, 3.9, 1.6, 1.56, -1.2, 1),
        (20.0, -10.0, -0.6, 0.8, 0.6, 1.73, 0.0, 2),
        # corner of the grid (window clamps)
        (0.4, -19.5, -0.8, 3.9, 1.6, 1.56, 1.0, 1),
        (34.2, 19.5, -0.8, 3.9, 1.6, 1.56, -2.0, 1),
        # center outside the range (window clamps to the edge)
        (-1.5, 0.0, -0.8, 3.9, 1.6, 1.56, 0.0, 1),
        # overlapping near-duplicate with slightly better fit
        (10.1, 5.1, -0.8, 3.8, 1.55, 1.5, 0.3, 1),
    ]
    for i, b in enumerate(boxes):
        gt[0, i, :7] = b[:7]
        gt[0, i, 7] = b[7]
    dense = assign_targets(
        jnp.asarray(flat), jnp.asarray(tiled[0]), jnp.asarray(tiled[1]),
        jnp.asarray(tiled[2]), jnp.asarray(gt), box_coder=coder,
    )
    for method in ("loop", "scatter"):
        windowed = assign_targets_windowed(
            jnp.asarray(anchors), jnp.asarray(groups),
            jnp.asarray(matched), jnp.asarray(unmatched),
            jnp.asarray(gt), box_coder=coder, window=w, method=method,
        )
        _assert_equal(dense, windowed)
    assert int(jnp.sum(dense["box_cls_labels"] > 0)) > 0


def test_windowed_equals_dense_9dof():
    """SlopedKITTI anchor-head configs carry 9-DoF gts (x y z dx dy dz
    yaw pitch roll cls): the encode tail pads anchors to the gt width."""
    anchors, flat, groups, matched, unmatched, tiled, coder = _setup()
    w = choose_window_cells(anchors)
    rng = np.random.RandomState(11)
    gt7 = np.stack([_random_scene(rng, 8, 6), _random_scene(rng, 8, 2)])
    gt = np.zeros((2, 8, 10), np.float32)
    gt[..., :7] = gt7[..., :7]
    gt[..., 7] = rng.uniform(-0.3, 0.3, (2, 8)) * (gt7[..., 7] > 0)
    gt[..., 8] = rng.uniform(-0.2, 0.2, (2, 8)) * (gt7[..., 7] > 0)
    gt[..., 9] = gt7[..., 7]
    from de6d_tpu.utils.box_coder_utils import build_box_coder

    coder9 = build_box_coder("ResidualCoder", code_size=9)
    dense = assign_targets(
        jnp.asarray(flat), jnp.asarray(tiled[0]), jnp.asarray(tiled[1]),
        jnp.asarray(tiled[2]), jnp.asarray(gt), box_coder=coder9,
    )
    windowed = assign_targets_windowed(
        jnp.asarray(anchors), jnp.asarray(groups), jnp.asarray(matched),
        jnp.asarray(unmatched), jnp.asarray(gt), box_coder=coder9,
        window=w,
    )
    _assert_equal(dense, windowed)
    assert int(jnp.sum(dense["box_cls_labels"] > 0)) > 0


def test_multihead_partition_equals_dense_concat():
    """Per-head windowed assignment concatenated == dense assignment
    over the concatenated anchor set (classes partition across heads,
    so per-gt force-match maxima never cross heads)."""
    coder = box_coder_utils.build_box_coder("ResidualCoder")
    head_anchor_sets = []
    for sub in ([ANCHOR_CFG[0]], [ANCHOR_CFG[1]]):
        a, g, mt, ut, _ = generate_anchors(sub, GRID, PC_RANGE)
        # remap local group 0 → global class index
        gglob = np.array(
            [0 if sub[0]["class_name"] == "Car" else 1], np.int32
        )[g]
        head_anchor_sets.append((a, gglob, mt, ut))

    rng = np.random.RandomState(7)
    gt = np.stack([_random_scene(rng, 10, 7), _random_scene(rng, 10, 3)])

    flat = np.concatenate(
        [a.reshape(-1, a.shape[-1]) for a, *_ in head_anchor_sets]
    )
    tiled = [
        np.concatenate(
            [np.tile(v, a.shape[0] * a.shape[1])
             for (a, g, mt, ut) in head_anchor_sets
             for v in ([g] if i == 0 else [mt] if i == 1 else [ut])]
        )
        for i in range(3)
    ]
    dense = assign_targets(
        jnp.asarray(flat), jnp.asarray(tiled[0]), jnp.asarray(tiled[1]),
        jnp.asarray(tiled[2]), jnp.asarray(gt), box_coder=coder,
    )
    parts = [
        assign_targets_windowed(
            jnp.asarray(a), jnp.asarray(g), jnp.asarray(mt),
            jnp.asarray(ut), jnp.asarray(gt), box_coder=coder,
            window=choose_window_cells(a),
        )
        for a, g, mt, ut in head_anchor_sets
    ]
    windowed = {
        k: jnp.concatenate([p[k] for p in parts], axis=1) for k in parts[0]
    }
    _assert_equal(dense, windowed)
    assert int(jnp.sum(dense["box_cls_labels"] > 0)) > 0


def test_single_class_only_scene():
    """All gts one class — the other class's anchors must see the
    analytic base (-1 → label 0 everywhere below unmatched_thr)."""
    anchors, flat, groups, matched, unmatched, tiled, coder = _setup()
    w = choose_window_cells(anchors)
    rng = np.random.RandomState(3)
    gt = _random_scene(rng, 6, 4, cls_choices=(2,))[None]
    dense = assign_targets(
        jnp.asarray(flat), jnp.asarray(tiled[0]), jnp.asarray(tiled[1]),
        jnp.asarray(tiled[2]), jnp.asarray(gt), box_coder=coder,
    )
    windowed = assign_targets_windowed(
        jnp.asarray(anchors), jnp.asarray(groups), jnp.asarray(matched),
        jnp.asarray(unmatched), jnp.asarray(gt), box_coder=coder, window=w,
    )
    _assert_equal(dense, windowed)
