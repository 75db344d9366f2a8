"""Host-path numpy box utils agree with the device (jnp) versions."""

import numpy as np

from de6d_tpu.ops import geometry
from de6d_tpu.utils import box_np_utils


def _boxes(rng, n, ndim=7):
    b = np.zeros((n, ndim), np.float32)
    b[:, 0:3] = rng.uniform(-20, 20, (n, 3))
    b[:, 3:6] = rng.uniform(0.5, 5, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if ndim >= 9:
        b[:, 7] = rng.uniform(-0.3, 0.3, n)
        b[:, 8] = rng.uniform(-0.3, 0.3, n)
    return b


def test_points_in_boxes_parity():
    rng = np.random.RandomState(7)
    pts = rng.uniform(-25, 25, (500, 3)).astype(np.float32)
    for ndim in (7, 9):
        boxes = _boxes(rng, 12, ndim)
        m_np = box_np_utils.points_in_boxes_mask(pts, boxes)
        m_j = np.asarray(geometry.points_in_boxes_mask(pts, boxes))
        np.testing.assert_array_equal(m_np, m_j)
        i_np = box_np_utils.points_in_boxes_index(pts, boxes)
        i_j = np.asarray(geometry.points_in_boxes_index(pts, boxes))
        np.testing.assert_array_equal(i_np, i_j)


def test_points_in_boxes_index_empty_boxes():
    rng = np.random.RandomState(3)
    pts = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
    idx = box_np_utils.points_in_boxes_index(pts, np.zeros((0, 7), np.float32))
    assert idx.shape == (50,) and (idx == -1).all()


def test_mask_boxes_outside_range_parity():
    rng = np.random.RandomState(11)
    boxes = _boxes(rng, 40)
    limit = [-15, -15, -3, 15, 15, 3]
    for k in (1, 8):
        m_np = box_np_utils.mask_boxes_outside_range(boxes, limit, k)
        m_j = np.asarray(
            geometry.mask_boxes_outside_range(boxes, limit, k)
        )
        np.testing.assert_array_equal(m_np, m_j)


def test_corners_parity():
    rng = np.random.RandomState(5)
    boxes = _boxes(rng, 20)
    np.testing.assert_allclose(
        box_np_utils.boxes_to_corners_3d(boxes),
        np.asarray(geometry.boxes_to_corners_3d(boxes)),
        atol=1e-4,
    )
