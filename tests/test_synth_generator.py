"""Regression: the synthetic-KITTI generator must emit yaw-consistent
labels — the car point cloud has to actually lie inside (and be
oriented like) the labeled 9-DoF box. Round 2 shipped axis-aligned
point blobs under randomly-yawed labels, which made yaw geometrically
unlearnable and sank Det6D's trained orientation score to 0."""

import numpy as np
import pytest


def _count_in(pts, b, dyaw=0.0, slack=0.05):
    ry = b[6] + dyaw
    c, s = np.cos(ry), np.sin(ry)
    local = pts[:, :3] - b[:3]
    lx = c * local[:, 0] + s * local[:, 1]
    ly = -s * local[:, 0] + c * local[:, 1]
    return int(
        (
            (np.abs(lx) <= b[3] / 2 + slack)
            & (np.abs(ly) <= b[4] / 2 + slack)
            & (np.abs(local[:, 2]) <= b[5] / 2 + slack)
        ).sum()
    )


def test_sample_car_points_oriented():
    from de6d_tpu.tools.make_synth_kitti import sample_car_points

    rng = np.random.RandomState(0)
    for yaw in (-2.8, -1.3, 0.0, 0.7, 1.57, 3.0):
        box = np.array([10.0, -3.0, -1.0, 4.2, 1.6, 1.5, yaw], np.float32)
        pts = sample_car_points(box, 200, rng)
        n0 = _count_in(pts, box)
        n90 = _count_in(pts, box, np.pi / 2)
        assert n0 >= 190, (yaw, n0)
        assert n0 > 1.5 * max(n90, 1), (yaw, n0, n90)


def test_sample_car_points_heading_asymmetric():
    """Front/back must be distinguishable (cabin sits toward the rear),
    otherwise heading sign can never be learned."""
    from de6d_tpu.tools.make_synth_kitti import sample_car_points

    rng = np.random.RandomState(1)
    box = np.array([0.0, 0.0, 0.0, 4.0, 1.6, 1.5, 0.0], np.float32)
    pts = sample_car_points(box, 2000, rng)
    # upper-half points (cabin) should have a rear-shifted (negative-x)
    # centroid
    upper = pts[pts[:, 2] > 0.15 * 1.5]
    assert len(upper) > 100
    assert upper[:, 0].mean() < -0.2


def test_generated_tree_yaw_consistent(tmp_path):
    from de6d_tpu.tools.make_synth_kitti import build_tree
    import pickle

    build_tree(tmp_path, frames=3, train_frac=1.0, seed=0, n_points=2000,
               cars_per_frame=2)
    # parse labels back through the dataset's own label->lidar path
    from de6d_tpu.utils import box_np_ops, calibration_kitti, object3d_kitti

    good = bad = 0
    for f in sorted((tmp_path / "training" / "label_2").glob("*.txt")):
        fid = f.stem
        pts = np.fromfile(
            str(tmp_path / "training" / "velodyne" / f"{fid}.bin"),
            np.float32,
        ).reshape(-1, 4)
        calib = calibration_kitti.Calibration(
            tmp_path / "training" / "calib" / f"{fid}.txt"
        )
        objs = object3d_kitti.get_objects_from_label(f)
        loc = np.stack([o.loc for o in objs])
        dims = np.array([[o.l, o.h, o.w] for o in objs])
        rots = np.array([o.ry for o in objs])
        loc_lidar = calib.rect_to_lidar(loc)
        loc_lidar[:, 2] += dims[:, 1] / 2
        boxes = np.concatenate(
            [loc_lidar, dims[:, [0, 2, 1]],
             -(np.pi / 2 + rots[:, None].squeeze(-1))[:, None]],
            axis=1,
        )
        for b in boxes:
            n0 = _count_in(pts, b, slack=0.1)
            n90 = _count_in(pts, b, np.pi / 2, slack=0.1)
            if n0 >= 30 and n0 > 1.3 * max(n90, 1):
                good += 1
            else:
                bad += 1
    assert bad == 0, (good, bad)
    assert good >= 6
