"""KITTI eval protocol tests on synthetic annos (native + python kernels)."""

import numpy as np
import pytest

from de6d_tpu.datasets.eval import kitti_eval
from de6d_tpu.native import native_eval


def make_annos(rng, n_frames=8, n_gt=6, drop_frac=0.0, jitter=0.0,
               score_seed=1):
    """Synthetic camera-frame gt + detections."""
    gt_annos, dt_annos = [], []
    srng = np.random.RandomState(score_seed)
    for f in range(n_frames):
        loc = np.stack(
            [rng.uniform(-20, 20, n_gt), rng.uniform(1, 2, n_gt),
             rng.uniform(10, 60, n_gt)], axis=1,
        )
        dims = np.stack(
            [rng.uniform(3.5, 4.5, n_gt), rng.uniform(1.4, 1.7, n_gt),
             rng.uniform(1.5, 1.8, n_gt)], axis=1,
        )  # l, h, w
        rots = rng.uniform(-np.pi, np.pi, n_gt)
        bbox = np.zeros((n_gt, 4))
        bbox[:, 0] = rng.uniform(0, 1000, n_gt)
        bbox[:, 1] = rng.uniform(0, 200, n_gt)
        bbox[:, 2] = bbox[:, 0] + rng.uniform(60, 120, n_gt)
        bbox[:, 3] = bbox[:, 1] + rng.uniform(45, 120, n_gt)  # height > 40
        gt = {
            "name": np.array(["Car"] * n_gt),
            "truncated": np.zeros(n_gt),
            "occluded": np.zeros(n_gt),
            "alpha": rng.uniform(-np.pi, np.pi, n_gt),
            "bbox": bbox,
            "location": loc,
            "dimensions": dims,
            "rotation_y": rots,
        }
        keep = np.ones(n_gt, bool)
        n_drop = int(drop_frac * n_gt)
        if n_drop:
            keep[rng.choice(n_gt, n_drop, replace=False)] = False
        dt = {
            "name": gt["name"][keep],
            "truncated": gt["truncated"][keep],
            "occluded": gt["occluded"][keep],
            "alpha": gt["alpha"][keep],
            "bbox": gt["bbox"][keep] + jitter,
            "location": gt["location"][keep] + jitter,
            "dimensions": gt["dimensions"][keep],
            "rotation_y": gt["rotation_y"][keep],
            "score": srng.uniform(0.3, 1.0, int(keep.sum())),
        }
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_perfect_detections_ap_100(rng):
    gt, dt = make_annos(rng)
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    assert ret["Car_3d/moderate_R40"] == pytest.approx(100.0, abs=0.1)
    assert ret["Car_bev/easy_R40"] == pytest.approx(100.0, abs=0.1)
    assert ret["Car_image/hard"] == pytest.approx(100.0, abs=0.5)
    assert ret["Car_aos/moderate_R40"] == pytest.approx(100.0, abs=0.5)


def test_missing_detections_reduce_ap(rng):
    gt, dt = make_annos(rng, n_frames=12, drop_frac=0.5)
    _, ret = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
    ap = ret["Car_3d/moderate_R40"]
    assert 20.0 < ap < 80.0  # max recall 0.5


def test_d3_overlap_identity(rng):
    boxes = np.zeros((3, 7))
    boxes[:, 0] = [0, 5, 10]
    boxes[:, 1] = 1.5
    boxes[:, 2] = 20
    boxes[:, 3:6] = [4, 1.5, 1.8]
    boxes[:, 6] = [0.3, -0.4, 1.0]
    o = kitti_eval.d3_box_overlap(boxes, boxes)
    np.testing.assert_allclose(np.diag(o), 1.0, atol=1e-4)
    assert o[0, 1] == 0.0


def test_native_matches_python_kernel(rng):
    if not native_eval.available():
        pytest.skip("no g++ native kernel")
    gt, dt = make_annos(rng, n_frames=6, drop_frac=0.3)
    # add DontCare rows + mixed classes to exercise ignore paths
    for g in gt:
        g["name"] = g["name"].copy()
        g["name"][0] = "DontCare"
        g["name"][1] = "Van"
    metric = 0
    overlaps = kitti_eval.calculate_iou_partly(dt, gt, metric)
    (
        gt_list, dt_list, igt, idt, dc, num_valid
    ) = kitti_eval._prepare_data(gt, dt, 0, 1)
    thresholds = np.linspace(0.95, 0.3, 11)
    pr_native = native_eval.fused_statistics(
        overlaps, gt_list, dt_list, igt, idt, dc, metric, 0.5,
        thresholds, True,
    )
    pr_py = np.zeros((len(thresholds), 4))
    for i in range(len(overlaps)):
        for t, th in enumerate(thresholds):
            tp, fp, fn, sim, _ = kitti_eval.compute_statistics(
                overlaps[i], gt_list[i], dt_list[i], igt[i], idt[i],
                dc[i], metric, min_overlap=0.5, thresh=th,
                compute_fp=True, compute_aos=True,
            )
            pr_py[t, 0] += tp
            pr_py[t, 1] += fp
            pr_py[t, 2] += fn
            if sim != -1:
                pr_py[t, 3] += sim
    np.testing.assert_allclose(pr_native, pr_py, atol=1e-9)


def test_thresholds_protocol():
    # descending-score TPs over 10 gts → 41-sample threshold ladder
    scores = np.linspace(0.9, 0.1, 10)
    th = kitti_eval.get_thresholds(scores.copy(), 10)
    assert len(th) <= 41 and th[0] == pytest.approx(0.9)
