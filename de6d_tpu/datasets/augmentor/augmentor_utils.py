"""Augmentation math kernels (host-side numpy).

Parity: reference datasets/augmentor/augmentor_utils.py. Boxes are
(N, 7+C) [x, y, z, dx, dy, dz, yaw(, pitch, roll)]; points (M, 3+C).
All functions are PURE (take an np.random.Generator-compatible
RandomState, return new arrays) — unlike the reference's global
np.random use, so the pipeline is reproducible per-sample.

Key kernel: ``random_global_make_slope`` — SlopeAug (reference
:622-694): pick a hinge point at polar distance ~ U(mean±var) along
~U(0±var) bearing, a rotation vector perpendicular to it with slope
angle ~ U(mean±var); every point/box beyond the hinge line (opposite
side from the origin) rotates about that axis; box pitch/roll pick up
the rotation's 'XYZ' intrinsic euler y/x components; angles wrap to
[-pi, pi).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

from ...utils.common_utils import (
    limit_period, rotate_points_along_z, keep_arrays_by_name,
)


def _uniform_pm(rng, n=1):
    """uniform in [-1, 1]"""
    return (rng.random_sample(n) - 0.5) * 2.0


def random_flip_along_x(gt_boxes, points, rng, enable=None):
    """Mirror y (reference :9-25). 9-DoF: roll flips sign."""
    if enable is None:
        enable = rng.randint(2) == 1
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]
    return gt_boxes, points


def random_flip_along_y(gt_boxes, points, rng, enable=None):
    """Mirror x (reference :28-44). 9-DoF: pitch flips sign."""
    if enable is None:
        enable = rng.randint(2) == 1
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rot_range, rng, angle=None):
    """Rotate the world about +z (reference :47-66). 9-DoF: the
    (pitch, roll) pair rotates as a 2-vector — the reference's (typo-
    prone but shipped) behavior, kept for parity."""
    if angle is None:
        angle = rng.uniform(rot_range[0], rot_range[1])
    points = rotate_points_along_z(points[None], np.array([angle]))[0]
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 0:3] = rotate_points_along_z(
        gt_boxes[None, :, 0:3], np.array([angle])
    )[0]
    gt_boxes[:, 6] += angle
    if gt_boxes.shape[1] > 7:
        pr = np.concatenate(
            [gt_boxes[:, 7:9], np.zeros((gt_boxes.shape[0], 1))], axis=1
        )
        gt_boxes[:, 7:9] = rotate_points_along_z(
            pr[None], np.array([angle])
        )[0][:, 0:2]
    return gt_boxes, points


def global_scaling(gt_boxes, points, scale_range, rng, scale=None):
    """(reference :69-82)"""
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    if scale is None:
        scale = rng.uniform(scale_range[0], scale_range[1])
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    return gt_boxes, points


def random_translation_along_axis(gt_boxes, points, offset_std, axis, rng):
    """World translation (reference random_translation_along_x/y/z)."""
    offset = rng.normal(0, offset_std)
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, axis] += offset
    gt_boxes[:, axis] += offset
    return gt_boxes, points


def random_local_rotation(gt_boxes, points, rot_range, rng):
    """Per-object rotation about each box center (reference
    random_local_rotation)."""
    from ...ops import geometry
    import numpy as _np

    gt_boxes = gt_boxes.copy()
    points = points.copy()
    mask = np.asarray(
        geometry.points_in_boxes_index(points[:, :3], gt_boxes)
    )
    for i in range(gt_boxes.shape[0]):
        angle = rng.uniform(rot_range[0], rot_range[1])
        sel = mask == i
        ctr = gt_boxes[i, 0:3]
        pts = points[sel]
        pts[:, 0:3] -= ctr
        pts[:, 0:3] = rotate_points_along_z(
            pts[None, :, 0:3], np.array([angle])
        )[0]
        pts[:, 0:3] += ctr
        points[sel] = pts
        gt_boxes[i, 6] += angle
    return gt_boxes, points


def random_local_scaling(gt_boxes, points, scale_range, rng):
    from ...ops import geometry

    gt_boxes = gt_boxes.copy()
    points = points.copy()
    mask = np.asarray(
        geometry.points_in_boxes_index(points[:, :3], gt_boxes)
    )
    for i in range(gt_boxes.shape[0]):
        scale = rng.uniform(scale_range[0], scale_range[1])
        sel = mask == i
        ctr = gt_boxes[i, 0:3]
        points[sel, 0:3] = (points[sel, 0:3] - ctr) * scale + ctr
        gt_boxes[i, 3:6] *= scale
    return gt_boxes, points


def random_global_make_slope(
    gt_boxes, points, params, rng,
    rotate_point=None, rotate_angle=None, smooth=False, bins=2,
):
    """SlopeAug (reference :622-694).

    params = (dist_mean, dist_var, angle_mean, angle_var); distances in
    meters, angles in radians. Returns (gt_boxes (N, ≥9), points,
    rotate_point, rotate_angle) — hinge params are persisted as the
    'slope plane' by the SlopedKITTI generator.
    """
    dist_mean, dist_var, angle_mean, angle_var = params
    if rotate_point is None:
        d = dist_mean + _uniform_pm(rng)[0] * dist_var
        bearing = 0.0 + _uniform_pm(rng)[0] * 0.0  # polar var 0 (ref)
        rotate_point = np.array(
            [d * np.cos(bearing), d * np.sin(bearing), 0.0]
        )
    x0, y0 = rotate_point[0], rotate_point[1]
    if rotate_angle is None:
        # rotation axis ⊥ to the hinge-point direction, in the xy plane
        k0 = y0 / x0 if x0 != 0 else 1e6
        k1 = -1.0 / (k0 + 1e-6)
        v = np.array([x0, x0 * k1, 0.0])
        v /= np.linalg.norm(v)
        angle = angle_mean + _uniform_pm(rng)[0] * angle_var
        rotate_angle = v * angle

    if smooth:
        # split the slope arc into `bins` hinge segments of delta each,
        # forming an approximately circular transition (reference
        # :649-666)
        alpha = rotate_angle[1]
        if abs(alpha) < 1e-9:
            return _apply_slope(gt_boxes, points, rotate_point, rotate_angle)
        radius = rotate_point[0] / abs(alpha)
        dist = rotate_point[0]
        rp, ra = rotate_point, rotate_angle
        for theta in np.linspace(0, alpha, bins):
            delta = alpha / bins
            center = np.array([dist, 0.0, radius])
            seg_point = center + np.array(
                [-radius * np.sin(theta), 0.0, -radius * np.cos(theta)]
            )
            seg_angle = np.array([0.0, delta, 0.0])
            gt_boxes, points, _, _ = _apply_slope(
                gt_boxes, points, seg_point, seg_angle
            )
        return gt_boxes, points, rp, ra

    return _apply_slope(gt_boxes, points, rotate_point, rotate_angle)


def _apply_slope(gt_boxes, points, rotate_point, rotate_angle):
    """Rotate everything beyond the hinge line about (point, rotvec)."""
    points = points.copy()
    gt_boxes = np.array(gt_boxes, copy=True)
    x0, y0 = rotate_point[0], rotate_point[1]
    k = rotate_angle[1] / (rotate_angle[0] + 1e-6)
    sign = np.sign(k * (0 - x0) + y0 - 0)

    rot = Rotation.from_rotvec(rotate_angle).as_matrix()

    def beyond(xy):
        return np.sign(k * (xy[:, 0] - x0) + y0 - xy[:, 1]) != sign

    pmask = beyond(points[:, 0:2])
    moved = points[pmask]
    moved[:, 0:3] = (moved[:, 0:3] - rotate_point) @ rot.T + rotate_point
    points[pmask] = moved

    if gt_boxes.shape[1] < 9:
        gt_boxes = np.concatenate(
            [gt_boxes, np.zeros((gt_boxes.shape[0], 2))], axis=1
        )
    bmask = beyond(gt_boxes[:, 0:2])
    gt_boxes[bmask, 0:3] = (
        (gt_boxes[bmask, 0:3] - rotate_point) @ rot.T + rotate_point
    )
    euler = Rotation.from_rotvec(rotate_angle).as_euler("XYZ")
    gt_boxes[bmask, 7] += euler[1]  # pitch
    gt_boxes[bmask, 8] += euler[0]  # roll
    gt_boxes[:, 6:9] = limit_period(
        gt_boxes[:, 6:9], offset=0.5, period=2 * np.pi
    )
    return gt_boxes, points, rotate_point, rotate_angle


def random_local_translation(gt_boxes, points, offset_range, axis, rng):
    """Per-object translation along one axis (reference
    random_local_translation_along_x/y/z)."""
    from ...ops import geometry

    gt_boxes = gt_boxes.copy()
    points = points.copy()
    idx = np.asarray(
        geometry.points_in_boxes_index(points[:, :3], gt_boxes)
    )
    for i in range(gt_boxes.shape[0]):
        offset = rng.uniform(offset_range[0], offset_range[1])
        sel = idx == i
        points[sel, axis] += offset
        gt_boxes[i, axis] += offset
    return gt_boxes, points


def global_frustum_dropout(gt_boxes, points, intensity_range, rng,
                           direction="top"):
    """Drop a frustum of points above/below/left/right of a random
    gt box (reference global_frustum_dropout_*): removes scene points
    whose bearing falls in the box's angular frustum on the chosen
    side."""
    if gt_boxes.shape[0] == 0:
        return gt_boxes, points
    intensity = rng.uniform(intensity_range[0], intensity_range[1])
    if intensity <= 0:
        return gt_boxes, points
    box = gt_boxes[rng.randint(gt_boxes.shape[0])]
    # angular extent of the box from the sensor
    ang = np.arctan2(box[1], box[0])
    half = np.arctan2(
        np.linalg.norm(box[3:5]) / 2, np.linalg.norm(box[:2])
    )
    pang = np.arctan2(points[:, 1], points[:, 0])
    in_frustum = np.abs(
        (pang - ang + np.pi) % (2 * np.pi) - np.pi
    ) < half * intensity
    if direction == "top":
        side = points[:, 2] > box[2] + box[5] / 2
    elif direction == "bottom":
        side = points[:, 2] < box[2] - box[5] / 2
    elif direction == "left":
        side = ((pang - ang + np.pi) % (2 * np.pi) - np.pi) > 0
    else:
        side = ((pang - ang + np.pi) % (2 * np.pi) - np.pi) < 0
    drop = in_frustum & side
    return gt_boxes, points[~drop]
