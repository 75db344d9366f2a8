"""Golden-value geometry tests, cross-checked against scipy rotations
and a brute-force Delaunay-hull containment oracle (the reference's
own method, box_utils.py:11-26,110-124)."""

import numpy as np
import pytest
from scipy.spatial import Delaunay
from scipy.spatial.transform import Rotation

from de6d_tpu.ops import geometry as G
from de6d_tpu.utils import common_utils


def random_boxes9d(rng, m, pitch_roll=True):
    boxes = np.zeros((m, 9), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-20, 20, (m, 3))
    boxes[:, 3:6] = rng.uniform(1.0, 5.0, (m, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, m)
    if pitch_roll:
        boxes[:, 7] = rng.uniform(-0.4, 0.4, m)
        boxes[:, 8] = rng.uniform(-0.4, 0.4, m)
    return boxes


def test_limit_period():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3.5 * np.pi, 1.2])
    out = np.asarray(G.limit_period(vals))
    ref = common_utils.limit_period(vals)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert np.all(out >= -np.pi - 1e-5) and np.all(out < np.pi + 1e-5)


def test_angles_to_matrix_vs_scipy(rng):
    angles = rng.uniform(-np.pi, np.pi, (32, 3)).astype(np.float64)
    ours = np.asarray(
        G.angles_to_matrix(angles[:, 0], angles[:, 1], angles[:, 2])
    )
    # reference convention: from_euler('zyx', [rz, ry, rx]) extrinsic
    ref = Rotation.from_euler("zyx", angles).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # numpy twin
    ours_np = common_utils.angles_to_matrix(
        angles[:, 0], angles[:, 1], angles[:, 2]
    )
    np.testing.assert_allclose(ours_np, ref, atol=1e-10)


def test_rotate_points_along_z(rng):
    pts = rng.randn(2, 50, 5).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 2).astype(np.float32)
    out = np.asarray(G.rotate_points_along_z(pts, ang))
    # oracle: explicit rotation
    for b in range(2):
        c, s = np.cos(ang[b]), np.sin(ang[b])
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        ref = pts[b, :, :3] @ rot.T
        np.testing.assert_allclose(out[b, :, :3], ref, atol=1e-4)
    np.testing.assert_allclose(out[..., 3:], pts[..., 3:])
    out_np = common_utils.rotate_points_along_z(pts, ang)
    np.testing.assert_allclose(out_np, out, atol=1e-4)


def test_corners_7dof_matches_9dof_when_flat(rng):
    boxes = random_boxes9d(rng, 16, pitch_roll=False)
    c7 = np.asarray(G.boxes_to_corners_3d(boxes[:, :7]))
    c9 = np.asarray(G.boxes9d_to_corners_3d(boxes))
    np.testing.assert_allclose(c7, c9, atol=1e-4)


def test_corners_9dof_vs_scipy(rng):
    boxes = random_boxes9d(rng, 16)
    ours = np.asarray(G.boxes9d_to_corners_3d(boxes))
    # oracle = the reference formula with scipy (box_utils.py:57-71)
    template = np.array(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]]) / 2
    corners = boxes[:, None, 3:6] * template[None]
    rot = Rotation.from_euler("zyx", boxes[:, 6:9]).as_matrix()
    ref = np.matmul(corners, rot.transpose(0, 2, 1)) + boxes[:, None, 0:3]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_points_in_boxes_vs_hull(rng):
    boxes = random_boxes9d(rng, 8)
    pts = rng.uniform(-25, 25, (500, 3)).astype(np.float32)
    ours = np.asarray(G.points_in_boxes_mask(pts, boxes))
    template = np.array(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]]) / 2
    corners = boxes[:, None, 3:6] * template[None]
    rot = Rotation.from_euler("zyx", boxes[:, 6:9]).as_matrix()
    corners = np.matmul(corners, rot.transpose(0, 2, 1)) + boxes[:, None, 0:3]
    for m in range(boxes.shape[0]):
        hull = Delaunay(corners[m])
        ref = hull.find_simplex(pts) >= 0
        # boundary tolerance differences allowed: compare on points not
        # within 1cm of the box surface
        rotm = rot[m]
        local = np.abs((pts - boxes[m, :3]) @ rotm)
        margin = np.max(local - boxes[m, 3:6] / 2, axis=1)
        decided = np.abs(margin) > 1e-2
        np.testing.assert_array_equal(ours[m][decided], ref[decided])


def test_points_in_boxes_index_last_wins(rng):
    # two identical overlapping boxes: index must be the later one
    box = np.array([[0, 0, 0, 4, 4, 4, 0.3, 0.1, -0.1]], dtype=np.float32)
    boxes = np.concatenate([box, box], axis=0)
    pts = np.zeros((5, 3), dtype=np.float32)
    idx = np.asarray(G.points_in_boxes_index(pts, boxes))
    assert np.all(idx == 1)
    far = np.full((3, 3), 100.0, dtype=np.float32)
    idx2 = np.asarray(G.points_in_boxes_index(far, boxes))
    assert np.all(idx2 == -1)


def test_mask_boxes_outside_range(rng):
    boxes = np.array(
        [[0, 0, 0, 2, 2, 2, 0.0],   # inside
         [100, 0, 0, 2, 2, 2, 0.0],  # fully outside
         [39.5, 0, 0, 2, 2, 2, 0.0]],  # straddles x=40
        dtype=np.float32,
    )
    limit = [-40, -40, -5, 40, 40, 5]
    keep = np.asarray(G.mask_boxes_outside_range(boxes, limit))
    np.testing.assert_array_equal(keep, [True, False, True])
    keep_all = np.asarray(G.mask_boxes_outside_range(boxes, limit, 8))
    np.testing.assert_array_equal(keep_all, [True, False, False])


def test_enlarge_box3d():
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.1]], dtype=np.float32)
    out = np.asarray(G.enlarge_box3d(boxes, [0.2, 0.2, 0.2]))
    np.testing.assert_allclose(out[0, 3:6], [2.4, 2.4, 2.4], atol=1e-6)
    np.testing.assert_allclose(out[0, :3], boxes[0, :3])
