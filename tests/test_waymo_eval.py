"""Devkit-free Waymo mAP/mAPH metric."""

import numpy as np
import pytest

from de6d_tpu.datasets.waymo.waymo_eval_np import evaluate_waymo


@pytest.fixture
def rng():
    return np.random.RandomState(41)


def _frames(rng, n_frames=4, heading_error=0.0, shift=0.0,
            sparse_half=False):
    gts, dets = [], []
    for f in range(n_frames):
        g = np.zeros((4, 7))
        g[:, 0] = rng.uniform(-30, 30, 4)
        g[:, 1] = rng.uniform(-30, 30, 4)
        g[:, 3:6] = [4.5, 1.9, 1.7]
        g[:, 6] = rng.uniform(-np.pi, np.pi, 4)
        npts = np.full(4, 50)
        if sparse_half:
            npts[:2] = 3  # LEVEL_2-only gts
        gts.append({
            "gt_boxes": g, "name": np.array(["Vehicle"] * 4),
            "num_points_in_gt": npts,
        })
        d = g.copy()
        d[:, 0] += shift
        d[:, 6] += heading_error
        dets.append({
            "boxes_lidar": d,
            "score": np.linspace(0.95, 0.6, 4),
            "name": np.array(["Vehicle"] * 4),
        })
    return gts, dets


def test_perfect_dets_full_ap(rng):
    gts, dets = _frames(rng)
    _, m = evaluate_waymo(gts, dets, ["Vehicle"])
    assert m["Vehicle/LEVEL_1/AP"] > 0.99
    assert m["Vehicle/LEVEL_2/AP"] > 0.99
    assert abs(m["Vehicle/LEVEL_1/APH"] - m["Vehicle/LEVEL_1/AP"]) < 1e-6


def test_heading_error_reduces_aph_not_ap(rng):
    # a pi flip leaves the rectangle (and IoU) essentially identical
    # but zeroes the heading weight: AP stays ~1, APH ~0. (A 2 cm shift
    # avoids the exactly-coincident-flipped-edges degeneracy of the
    # Green's-pass overlap.)
    gts, dets = _frames(rng, heading_error=np.pi, shift=0.02)
    _, m = evaluate_waymo(gts, dets, ["Vehicle"])
    assert m["Vehicle/LEVEL_1/AP"] > 0.99
    assert m["Vehicle/LEVEL_1/APH"] < 0.02


def test_level2_includes_sparse_gts(rng):
    gts, dets = _frames(rng, sparse_half=True)
    _, m = evaluate_waymo(gts, dets, ["Vehicle"])
    # Perfect detections: L2 counts everything; for L1 the detections
    # matched to sparse (L2-only) gts are don't-care, NOT false
    # positives — both levels stay near 1 (official WOD breakdown
    # semantics).
    assert m["Vehicle/LEVEL_2/AP"] > 0.99
    assert m["Vehicle/LEVEL_1/AP"] > 0.99


def test_unmatched_dets_still_fp_for_level1(rng):
    # detections that match nothing must still count as FPs in L1
    gts, dets = _frames(rng, sparse_half=True)
    for d in dets:
        extra = d["boxes_lidar"][:1].copy()
        extra[:, 0] += 15.0  # far from any gt
        d["boxes_lidar"] = np.concatenate([d["boxes_lidar"], extra])
        d["score"] = np.concatenate([d["score"], [0.99]])
        d["name"] = np.concatenate([d["name"], ["Vehicle"]])
    _, m = evaluate_waymo(gts, dets, ["Vehicle"])
    assert m["Vehicle/LEVEL_1/AP"] < 0.99
    assert m["Vehicle/LEVEL_2/AP"] < 0.99


def test_large_shift_zero_ap(rng):
    gts, dets = _frames(rng, shift=10.0)
    _, m = evaluate_waymo(gts, dets, ["Vehicle"])
    assert m["Vehicle/LEVEL_1/AP"] == 0.0
