"""Device-side (jit-friendly, jnp) box/point geometry.

Box conventions follow the reference (OpenPCDet lidar frame):

- 7-DoF box:  ``[x, y, z, dx, dy, dz, yaw]`` — (x,y,z) box center,
  dx along box-x, yaw counter-clockwise about +z
  (reference box_utils.boxes_to_corners_3d, box_utils.py:29-54).
- 9-DoF box:  ``[x, y, z, dx, dy, dz, rz(yaw), ry(pitch), rx(roll)]``
  with rotation matrix ``R = Rx(rx) @ Ry(ry) @ Rz(rz)`` — scipy
  ``from_euler('zyx', [rz,ry,rx])`` extrinsic convention
  (reference box_utils.boxes3d_to_corners_3d, box_utils.py:57-71).

The reference's 9-DoF point-in-box test used a CPU scipy Delaunay hull
per box (box_utils.points_in_boxes3d, :110-124 — its worst training
bottleneck). Here it is an exact oriented-bounding-box containment
test: rotate points into the box frame and bound-check — fully
vectorized on the VPU.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

# Geometry must be exact: pin einsum/matmul to full fp32 precision
# (this environment defaults dots to bf16, fine for model GEMMs but
# not for coordinates).
_HI = jax.lax.Precision.HIGHEST

# corner template in box frame, matching the reference's ordering
#         7 -------- 4
#        /|         /|
#       6 -------- 5 .
#       | |        | |
#       . 3 -------- 0
#       |/         |/
#       2 -------- 1
# numpy on purpose: a module-level jnp.array would initialize the JAX
# backend at import time, defeating the CLIs' --platform override
CORNER_TEMPLATE = (
    np.array(
        [
            [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
            [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
        ],
        dtype=np.float32,
    )
    / 2.0
)


def limit_period(val, offset=0.5, period=2 * jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(...,) yaw → (..., 3, 3) CCW rotation about +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1)
    return rot.reshape(*angle.shape, 3, 3)


def rotation_matrix_2d(angle):
    """(...,) yaw → (..., 2, 2)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([c, -s, s, c], axis=-1).reshape(*angle.shape, 2, 2)


def angles_to_matrix(yaw, pitch=None, roll=None):
    """Euler → matrix, R = Rx(roll) @ Ry(pitch) @ Rz(yaw).

    Matches scipy Rotation.from_euler('zyx', [yaw, pitch, roll]) with
    extrinsic axes (reference 9-DoF convention). Broadcasts.
    """
    pitch = jnp.zeros_like(yaw) if pitch is None else pitch
    roll = jnp.zeros_like(yaw) if roll is None else roll
    cz, sz = jnp.cos(yaw), jnp.sin(yaw)
    cy, sy = jnp.cos(pitch), jnp.sin(pitch)
    cx, sx = jnp.cos(roll), jnp.sin(roll)
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    rot = jnp.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22], axis=-1)
    return rot.reshape(*jnp.shape(yaw), 3, 3)


def matrix_to_quat(R):
    """(..., 3, 3) → (..., 4) unit quaternion (w, x, y, z) — Shepperd's
    branchless 4-candidate method (needed because the log map is
    unstable near pi; Det6D yaws span the full circle)."""
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.clip(1 + tr, 1e-12, None)) / 2
    qx = jnp.sqrt(jnp.clip(1 + m00 - m11 - m22, 1e-12, None)) / 2
    qy = jnp.sqrt(jnp.clip(1 - m00 + m11 - m22, 1e-12, None)) / 2
    qz = jnp.sqrt(jnp.clip(1 - m00 - m11 + m22, 1e-12, None)) / 2
    # four candidate quaternions, each stable in its own region
    c0 = jnp.stack([
        qw,
        (R[..., 2, 1] - R[..., 1, 2]) / (4 * qw),
        (R[..., 0, 2] - R[..., 2, 0]) / (4 * qw),
        (R[..., 1, 0] - R[..., 0, 1]) / (4 * qw),
    ], -1)
    c1 = jnp.stack([
        (R[..., 2, 1] - R[..., 1, 2]) / (4 * qx),
        qx,
        (R[..., 0, 1] + R[..., 1, 0]) / (4 * qx),
        (R[..., 0, 2] + R[..., 2, 0]) / (4 * qx),
    ], -1)
    c2 = jnp.stack([
        (R[..., 0, 2] - R[..., 2, 0]) / (4 * qy),
        (R[..., 0, 1] + R[..., 1, 0]) / (4 * qy),
        qy,
        (R[..., 1, 2] + R[..., 2, 1]) / (4 * qy),
    ], -1)
    c3 = jnp.stack([
        (R[..., 1, 0] - R[..., 0, 1]) / (4 * qz),
        (R[..., 0, 2] + R[..., 2, 0]) / (4 * qz),
        (R[..., 1, 2] + R[..., 2, 1]) / (4 * qz),
        qz,
    ], -1)
    mags = jnp.stack([qw, qx, qy, qz], -1)
    pick = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(
        cands, pick[..., None, None], axis=-2
    ).squeeze(-2)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def matrix_to_rotvec(R):
    """(..., 3, 3) → (..., 3) axis-angle (scipy as_rotvec parity)."""
    q = matrix_to_quat(R)
    # canonical sign: w >= 0 keeps angle in [0, pi]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    s = jnp.linalg.norm(q[..., 1:], axis=-1)
    angle = 2 * jnp.arctan2(s, q[..., 0])
    scale = jnp.where(s < 1e-8, 2.0, angle / jnp.where(s < 1e-8, 1.0, s))
    return q[..., 1:] * scale[..., None]


def rotvec_to_matrix(v):
    """(..., 3) axis-angle → (..., 3, 3) (Rodrigues, sinc-stable)."""
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-8
    axis = v / jnp.where(theta < 1e-8, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(theta[..., 0])
    s = jnp.sin(theta[..., 0])
    one_c = 1 - c
    rot = jnp.stack([
        c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s,
        y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s,
        z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c,
    ], -1).reshape(v.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), rot.shape)
    # first-order fallback for tiny angles: I + skew(v)
    skew = jnp.stack([
        jnp.zeros_like(x), -v[..., 2], v[..., 1],
        v[..., 2], jnp.zeros_like(x), -v[..., 0],
        -v[..., 1], v[..., 0], jnp.zeros_like(x),
    ], -1).reshape(rot.shape)
    return jnp.where(small[..., None, None], eye + skew, rot)


def matrix_to_euler_zyx(R):
    """(..., 3, 3) → (yaw, pitch, roll) matching scipy
    as_euler('zyx') for matrices built by angles_to_matrix
    (R = Rx(roll) @ Ry(pitch) @ Rz(yaw))."""
    pitch = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    yaw = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    roll = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    return yaw, pitch, roll


def rotvec_to_euler_zyx(v):
    """(..., 3) axis-angle → stacked (..., 3) (yaw, pitch, roll)."""
    yaw, pitch, roll = matrix_to_euler_zyx(rotvec_to_matrix(v))
    return jnp.stack([yaw, pitch, roll], axis=-1)


def euler_zyx_to_rotvec(yaw, pitch, roll):
    """Euler (zyx) → (..., 3) axis-angle (scipy
    from_euler('zyx').as_rotvec parity)."""
    return matrix_to_rotvec(angles_to_matrix(yaw, pitch, roll))


def boxes_to_rotation_matrix(boxes):
    """(..., 7|9+) boxes → (..., 3, 3) rotation matrices."""
    if boxes.shape[-1] >= 9:
        return angles_to_matrix(boxes[..., 6], boxes[..., 7], boxes[..., 8])
    return rotation_matrix_z(boxes[..., 6])


def rotate_points_along_z(points, angle):
    """(B, N, 3+C) points, (B,) yaw → rotated points (extra chans pass)."""
    rot = rotation_matrix_z(angle)
    xyz = jnp.einsum("bnj,bkj->bnk", points[..., :3], rot, precision=_HI)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def boxes_to_corners_3d(boxes):
    """(N, 7+) yaw-only boxes → (N, 8, 3) corners (reference ordering)."""
    corners = boxes[:, None, 3:6] * CORNER_TEMPLATE[None]  # (N, 8, 3)
    rot = rotation_matrix_z(boxes[:, 6])  # (N, 3, 3)
    corners = jnp.einsum("nij,nkj->nki", rot, corners, precision=_HI)
    return corners + boxes[:, None, 0:3]


def boxes9d_to_corners_3d(boxes):
    """(N, 9+) full-pose boxes → (N, 8, 3) corners.

    Parity target: reference box_utils.boxes3d_to_corners_3d (:57-71),
    which right-multiplies by rot^T, i.e. corners ← R @ corner.
    """
    corners = boxes[:, None, 3:6] * CORNER_TEMPLATE[None]
    rot = angles_to_matrix(boxes[:, 6], boxes[:, 7], boxes[:, 8])
    corners = jnp.einsum("nij,nkj->nki", rot, corners, precision=_HI)
    return corners + boxes[:, None, 0:3]


def boxes_to_corners_bev(boxes):
    """(N, 7+) boxes → (N, 4, 2) BEV rectangle corners (CCW order
    0:(+x,+y) 1:(+x,-y) 2:(-x,-y) 3:(-x,+y) in box frame, i.e. the
    bottom 4 of the 3D template)."""
    template = CORNER_TEMPLATE[:4, :2]  # (4, 2)
    corners = boxes[:, None, 3:5] * template[None]
    rot = rotation_matrix_2d(boxes[:, 6])
    corners = jnp.einsum("nij,nkj->nki", rot, corners, precision=_HI)
    return corners + boxes[:, None, 0:2]


def points_in_boxes_mask(points, boxes):
    """Exact OBB containment, 7- or 9-DoF.

    Args:
        points: (N, 3+) point coords.
        boxes:  (M, 7|9+) boxes.
    Returns:
        mask: (M, N) bool — point n inside box m (boundary inclusive).

    Replaces both the reference CUDA points_in_boxes kernel
    (roiaware_pool3d_kernel.cu) and the CPU Delaunay-hull 9-DoF path
    (box_utils.points_in_boxes3d).
    """
    rot = boxes_to_rotation_matrix(boxes)  # (M, 3, 3)
    local = points[None, :, :3] - boxes[:, None, 0:3]  # (M, N, 3)
    # box frame: R^T @ (p - c)
    local = jnp.einsum("mji,mnj->mni", rot, local, precision=_HI)
    half = boxes[:, None, 3:6] / 2.0
    return jnp.all(jnp.abs(local) <= half + 1e-6, axis=-1)


def points_in_boxes_index(points, boxes, valid_mask=None):
    """(N,3+), (M,7|9+) → (N,) int32: index of the containing box, -1 if
    none. Ties broken by the LAST box (reference points_in_boxes3d sets
    flags[in_hull(pts, corners_i)] = i in box order, so later wins)."""
    mask = points_in_boxes_mask(points, boxes)  # (M, N)
    if valid_mask is not None:
        mask = mask & valid_mask[:, None]
    m = boxes.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)[:, None]
    # last match wins → max over matching indices
    flags = jnp.max(jnp.where(mask, idx, -1), axis=0)
    return flags.astype(jnp.int32)


def enlarge_box3d(boxes, extra_width):
    """Grow (dx,dy,dz) by 2*extra_width (reference
    box_utils.enlarge_box3d) — used for target-assign margin."""
    boxes = jnp.asarray(boxes)
    extra = jnp.asarray(extra_width, dtype=boxes.dtype)
    return boxes.at[..., 3:6].add(2.0 * extra)


def mask_boxes_outside_range(boxes, limit_range, min_num_corners: int = 1):
    """(N, 7+) boxes, [x0,y0,z0,x1,y1,z1] → (N,) keep mask (reference
    box_utils.mask_boxes_outside_range_numpy)."""
    corners = boxes_to_corners_3d(boxes[:, :7])
    lo = jnp.asarray(limit_range[0:3])
    hi = jnp.asarray(limit_range[3:6])
    inside = jnp.all((corners >= lo) & (corners <= hi), axis=2)  # (N, 8)
    return jnp.sum(inside, axis=1) >= min_num_corners
