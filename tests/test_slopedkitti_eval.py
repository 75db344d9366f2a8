"""SlopedKITTI protocol tests: center-distance AP, ATE/ASE/AOE, ODS."""

import numpy as np
import pytest

from de6d_tpu.datasets.eval import slopedkitti_eval


def make_annos9d(rng, n_frames=10, n_gt=6, loc_err=0.0, pitch_err=0.0,
                 drop_frac=0.0):
    # ≥41 valid gts are needed to fill the 41-point recall ladder —
    # with fewer, even perfect detections score < 100 (the reference
    # protocol behaves identically)
    gt_annos, dt_annos = [], []
    for f in range(n_frames):
        loc = np.stack(
            [rng.uniform(-20, 20, n_gt), rng.uniform(1, 2, n_gt),
             rng.uniform(10, 60, n_gt)], axis=1,
        )
        dims = np.stack(
            [rng.uniform(3.5, 4.5, n_gt), rng.uniform(1.4, 1.7, n_gt),
             rng.uniform(1.5, 1.8, n_gt)], axis=1,
        )
        bbox = np.zeros((n_gt, 4))
        bbox[:, 0] = rng.uniform(0, 1000, n_gt)
        bbox[:, 1] = rng.uniform(0, 200, n_gt)
        bbox[:, 2] = bbox[:, 0] + 80
        bbox[:, 3] = bbox[:, 1] + 60
        gt = {
            "name": np.array(["Car"] * n_gt),
            "truncated": np.zeros(n_gt),
            "occluded": np.zeros(n_gt),
            "alpha": rng.uniform(-np.pi, np.pi, n_gt),
            "bbox": bbox,
            "location": loc,
            "dimensions": dims,
            "rotation_y": rng.uniform(-np.pi, np.pi, n_gt),
            "pitch": rng.uniform(-0.3, 0.3, n_gt),
            "roll": rng.uniform(-0.1, 0.1, n_gt),
        }
        keep = np.ones(n_gt, bool)
        nd = int(drop_frac * n_gt)
        if nd:
            keep[rng.choice(n_gt, nd, replace=False)] = False
        dt = {k: (v[keep].copy() if isinstance(v, np.ndarray) else v)
              for k, v in gt.items()}
        dt["location"] = dt["location"] + loc_err
        dt["pitch"] = dt["pitch"] + pitch_err
        dt["score"] = rng.uniform(0.3, 1.0, int(keep.sum()))
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_perfect_full_pose(rng):
    gt, dt = make_annos9d(rng)
    result, ret = slopedkitti_eval.get_slopedkitti_eval_result(gt, dt, ["Car"])
    assert ret["Car_3d/moderate_R40"] == pytest.approx(100.0, abs=0.1)
    assert ret["Car_cap/all_R40"] == pytest.approx(100.0, abs=0.1)
    assert ret["Car_ats/all"] == pytest.approx(1.0, abs=1e-6)
    assert ret["Car_ass/all"] == pytest.approx(1.0, abs=1e-6)
    assert ret["Car_aoe_score/all"] == pytest.approx(1.0, abs=1e-6)
    # perfect → ODS = 100/200 + 3*(1/6) = 1.0
    assert ret["Car_ods/all_R40"] == pytest.approx(1.0, abs=1e-3)


def test_translation_error_reduces_ats(rng):
    gt, dt = make_annos9d(rng, loc_err=0.3)
    _, ret = slopedkitti_eval.get_slopedkitti_eval_result(gt, dt, ["Car"])
    # |Δctr| = 0.3*sqrt(3) ≈ 0.52 → ATS ≈ 1 - 0.52
    err = 0.3 * np.sqrt(3)
    assert ret["Car_ats/all"] == pytest.approx(1 - err, abs=1e-3)
    # center-distance AP still 100 (0.52m < 1m threshold)
    assert ret["Car_cap/all_R40"] == pytest.approx(100.0, abs=0.1)


def test_pitch_error_reduces_orientation_score(rng):
    gt, dt = make_annos9d(rng, pitch_err=0.2)
    _, ret = slopedkitti_eval.get_slopedkitti_eval_result(gt, dt, ["Car"])
    assert ret["Car_aoe_score/all"] == pytest.approx(0.8, abs=1e-3)
    assert ret["Car_ats/all"] == pytest.approx(1.0, abs=1e-6)


def test_d9_matching_score_values():
    a = np.zeros((1, 9))
    a[0, 3:6] = [4, 1.6, 1.5]
    b = a.copy()
    b[0, 0] = 1.0  # 1 m away
    s = slopedkitti_eval.d9_box_matching_score(a, b)
    assert s[0, 0] == pytest.approx(2 - 2 / (1 + np.exp(-1.0)), abs=1e-6)
    # 1 m ⇒ score ≈ 0.537 > 0.53 threshold; 2 m ⇒ ≈ 0.238 > 0.2
    b[0, 0] = 2.0
    s2 = slopedkitti_eval.d9_box_matching_score(a, b)
    assert 0.2 < s2[0, 0] < 0.24
