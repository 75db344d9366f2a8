"""Rotated BEV / 3D box IoU — vectorized XLA, no CUDA.

TPU-native replacement for the reference iou3d_nms extension
(/root/reference/core/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu):
instead of the branchy polygon-clipping device function
(`box_overlap`, kernel.cu:104-225) we use the same formulation as the
reference's numba eval kernel (kitti rotate_iou.py): the intersection
of two convex rectangles is the convex hull of

  (a) corners of A inside B,
  (b) corners of B inside A,
  (c) pairwise edge-edge intersection points (≤16),

sorted by angle around their centroid, with a masked shoelace area.
Everything is fixed-shape (24 candidate vertices) and fully
vectorized — no data-dependent control flow.

Memory: the pairwise path materializes (N, M, 24, 2) scratch. For the
N≈M≈few-thousand NMS/recall workloads this is fine; for bigger tiles
call in row chunks (see nms.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import boxes_to_corners_bev

_HI = jax.lax.Precision.HIGHEST
EPS = 1e-8


def _corners_in_rect(pts, rect_corners):
    """pts: (..., P, 2); rect_corners: (..., 4, 2) ordered ring.
    Returns (..., P) bool — inside (boundary-inclusive-ish)."""
    # edge vectors and point offsets; inside iff all cross products have
    # the ring's orientation sign.
    a = rect_corners
    b = jnp.roll(rect_corners, -1, axis=-2)  # next corner
    e = b - a  # (..., 4, 2)
    # cross_{..., p, k} = e_k × (pt_p - a_k)
    d = pts[..., :, None, :] - a[..., None, :, :]  # (..., P, 4, 2)
    cross = e[..., None, :, 0] * d[..., 1] - e[..., None, :, 1] * d[..., 0]
    pos = jnp.all(cross >= -EPS, axis=-1)
    neg = jnp.all(cross <= EPS, axis=-1)
    return pos | neg


def _segment_intersections(ca, cb):
    """All 4x4 edge-edge intersection points.

    ca, cb: (..., 4, 2) corner rings.
    Returns pts (..., 16, 2), valid (..., 16).
    """
    a0 = ca  # (..., 4, 2)
    a1 = jnp.roll(ca, -1, axis=-2)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=-2)
    # broadcast to (..., 4, 4, 2): edge i of A x edge j of B
    p = a0[..., :, None, :]
    r = (a1 - a0)[..., :, None, :]
    q = b0[..., None, :, :]
    s = (b1 - b0)[..., None, :, :]
    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (..., 4, 4)
    qp = q - p
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    denom = jnp.where(jnp.abs(rxs) < EPS, 1.0, rxs)
    t = qpxs / denom
    u = qpxr / denom
    valid = (
        (jnp.abs(rxs) >= EPS)
        & (t >= -EPS) & (t <= 1 + EPS)
        & (u >= -EPS) & (u <= 1 + EPS)
    )
    pts = p + t[..., None] * r  # (..., 4, 4, 2)
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def _convex_area_from_candidates(pts, valid):
    """Masked convex-hull area.

    pts: (..., K, 2) candidate vertices, valid: (..., K) mask. The valid
    points are assumed to form a convex set (they do: intersection of
    two convex polygons). Sort by angle around the centroid and apply a
    shoelace with invalid slots collapsed onto the first valid vertex
    (zero-area contributions).
    """
    k = pts.shape[-2]
    n = jnp.sum(valid, axis=-1)  # (...,)
    denom = jnp.maximum(n, 1)
    centroid = jnp.sum(
        jnp.where(valid[..., None], pts, 0.0), axis=-2
    ) / denom[..., None]
    ang = jnp.arctan2(
        pts[..., 1] - centroid[..., 1:2], pts[..., 0] - centroid[..., 0:1]
    )
    key = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(key, axis=-1)
    pts_s = jnp.take_along_axis(pts, order[..., None], axis=-2)
    valid_s = jnp.take_along_axis(valid, order, axis=-1)
    first = pts_s[..., 0:1, :]
    ring = jnp.where(valid_s[..., None], pts_s, first)
    nxt = jnp.roll(ring, -1, axis=-2)
    cross = ring[..., 0] * nxt[..., 1] - ring[..., 1] * nxt[..., 0]
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(n >= 3, area, 0.0)


def rect_intersection_area_hull(corners_a, corners_b):
    """(..., 4, 2) x (..., 4, 2) → (...,) overlap area via the
    candidate-vertex + angle-sort construction (matches the numba eval
    kernel's method). Kept as the slow reference oracle — the argsort
    over 24 candidates per pair dominates NMS cost on TPU."""
    in_b = _corners_in_rect(corners_a, corners_b)  # (..., 4)
    in_a = _corners_in_rect(corners_b, corners_a)  # (..., 4)
    inter_pts, inter_valid = _segment_intersections(corners_a, corners_b)
    pts = jnp.concatenate([corners_a, corners_b, inter_pts], axis=-2)
    valid = jnp.concatenate([in_b, in_a, inter_valid], axis=-1)
    return _convex_area_from_candidates(pts, valid)


def _green_clipped_edges(poly_edges_p0, poly_edges_p1, clip_corners,
                         boundary_eps: float = 0.0):
    """Green's-theorem contribution of each directed edge of one
    polygon clipped to the inside of a convex clip polygon.

    poly_edges_p0/p1: (..., E, 2) world-space edge endpoints.
    clip_corners: (..., 4, 2) convex clip ring.
    Returns (...,) summed 0.5*cross(p(t0), p(t1)) over clipped spans —
    branch-free Liang-Barsky interval clipping, no sorting.
    """
    a = clip_corners
    b = jnp.roll(clip_corners, -1, axis=-2)
    edge = b - a  # (..., 4, 2)
    # inward normal consistent with ring orientation: for each clip
    # edge, inside is where cross(edge, p - a) has the ring's sign.
    # determine ring sign from its own area
    ring_cross = jnp.sum(
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0], axis=-1,
        keepdims=True,
    )  # (..., 1) 2*signed area
    sign = jnp.where(ring_cross >= 0, 1.0, -1.0)[..., None]  # (..., 1, 1)

    p0 = poly_edges_p0[..., :, None, :]  # (..., E, 1, 2)
    d = (poly_edges_p1 - poly_edges_p0)[..., :, None, :]
    ae = a[..., None, :, :]  # (..., 1, 4, 2)
    ee = edge[..., None, :, :]
    # f(t) = cross(edge, p0 + t*d - a) * sign >= 0 for inside
    f0 = (
        ee[..., 0] * (p0[..., 1] - ae[..., 1])
        - ee[..., 1] * (p0[..., 0] - ae[..., 0])
    ) * sign - boundary_eps  # (..., E, 4)
    fd = (ee[..., 0] * d[..., 1] - ee[..., 1] * d[..., 0]) * sign
    # constraint: f0 + t*fd >= 0
    denom = jnp.where(jnp.abs(fd) < EPS, jnp.where(fd >= 0, EPS, -EPS), fd)
    t_cross = -f0 / denom
    lo = jnp.where(fd > 0, t_cross, 0.0)
    hi = jnp.where(fd < 0, t_cross, 1.0)
    # parallel & outside: infeasible
    infeasible = (jnp.abs(fd) < EPS) & (f0 < -EPS)
    lo = jnp.where(infeasible, 1.0, lo)
    hi = jnp.where(infeasible, 0.0, hi)
    t0 = jnp.clip(jnp.max(lo, axis=-1), 0.0, 1.0)  # (..., E)
    t1 = jnp.clip(jnp.min(hi, axis=-1), 0.0, 1.0)
    t1 = jnp.maximum(t0, t1)
    q0 = poly_edges_p0 + t0[..., None] * (poly_edges_p1 - poly_edges_p0)
    q1 = poly_edges_p0 + t1[..., None] * (poly_edges_p1 - poly_edges_p0)
    contrib = 0.5 * (q0[..., 0] * q1[..., 1] - q0[..., 1] * q1[..., 0])
    return jnp.sum(contrib, axis=-1)


def rect_intersection_area(corners_a, corners_b):
    """(..., 4, 2) x (..., 4, 2) → (...,) rotated-rect overlap area.

    Sort-free exact method: by Green's theorem, the (convex) boundary
    of A∩B consists of A's edges clipped into B plus B's edges clipped
    into A; the signed shoelace contributions of those clipped spans
    sum to the signed area, in ANY order. Each edge clip is a 4-
    constraint Liang-Barsky interval — ~100 flops/pair, pure VPU math,
    ~50x cheaper than the angle-sort construction on TPU.
    """
    a0 = corners_a
    a1 = jnp.roll(corners_a, -1, axis=-2)
    b0 = corners_b
    b1 = jnp.roll(corners_b, -1, axis=-2)
    # shared boundary segments (coincident edges, e.g. identical boxes)
    # belong to both ∂A∩B and ∂B∩A — tighten the second pass by a tiny
    # epsilon so they are counted exactly once (area error ≤ perimeter·ε)
    area = _green_clipped_edges(a0, a1, corners_b) + _green_clipped_edges(
        b0, b1, corners_a, boundary_eps=1e-5
    )
    return jnp.abs(area)


def _pairwise_green_pass(px, py, qx, qy, row_is_p: bool, boundary_eps):
    """One Green's pass: edges of polygon P clipped inside polygon Q,
    structure-of-arrays over the (N, M) pair grid.

    px, py: lists of 4 per-corner coordinate vectors of P;
    qx, qy: same for Q. When row_is_p, P vectors are (N,)-shaped (rows)
    and Q vectors (M,)-shaped (cols); else swapped. All arithmetic is
    (N, M)-shaped — the pair grid stays in the VPU lanes (the packed
    (..., 4, 2) formulation leaves 4/2-sized minor dims that tile
    terribly; this unrolled form is ~5x faster on v5e).

    Assumes both rings share the (clockwise) template orientation of
    boxes_to_corners_bev, so the orientation sign is the constant −1.
    """
    def row(v):
        return v[:, None] if row_is_p else v[None, :]

    def col(v):
        return v[None, :] if row_is_p else v[:, None]

    total = 0.0
    for e in range(4):
        p0x, p0y = row(px[e]), row(py[e])
        p1x, p1y = row(px[(e + 1) % 4]), row(py[(e + 1) % 4])
        dx = p1x - p0x
        dy = p1y - p0y
        t0 = None
        t1 = None
        for c in range(4):
            a0x, a0y = col(qx[c]), col(qy[c])
            ex = col(qx[(c + 1) % 4]) - a0x
            ey = col(qy[(c + 1) % 4]) - a0y
            # inside test with CW orientation: -cross(edge, p - a) >= eps
            f0 = -(ex * (p0y - a0y) - ey * (p0x - a0x)) - boundary_eps
            fd = -(ex * dy - ey * dx)
            small = jnp.abs(fd) < EPS
            denom = jnp.where(small, jnp.where(fd >= 0, EPS, -EPS), fd)
            t_cross = -f0 / denom
            lo = jnp.where(fd > 0, t_cross, 0.0)
            hi = jnp.where(fd < 0, t_cross, 1.0)
            infeasible = small & (f0 < -EPS)
            lo = jnp.where(infeasible, 1.0, lo)
            hi = jnp.where(infeasible, 0.0, hi)
            t0 = lo if t0 is None else jnp.maximum(t0, lo)
            t1 = hi if t1 is None else jnp.minimum(t1, hi)
        t0 = jnp.clip(t0, 0.0, 1.0)
        t1 = jnp.maximum(t0, jnp.clip(t1, 0.0, 1.0))
        q0x = p0x + t0 * dx
        q0y = p0y + t0 * dy
        q1x = p0x + t1 * dx
        q1y = p0y + t1 * dy
        total = total + 0.5 * (q0x * q1y - q0y * q1x)
    return total


def boxes_overlap_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV overlap area.

    boxes_a: (N, 7+), boxes_b: (M, 7+) → (N, M) float32.
    Parity: iou3d_nms boxes_overlap_bev_gpu. Uses the unrolled SoA
    Green's/Liang-Barsky kernel (see _pairwise_green_pass).
    """
    ca = boxes_to_corners_bev(boxes_a)  # (N, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (M, 4, 2)
    ax = [ca[:, i, 0] for i in range(4)]
    ay = [ca[:, i, 1] for i in range(4)]
    bx = [cb[:, i, 0] for i in range(4)]
    by = [cb[:, i, 1] for i in range(4)]
    area = _pairwise_green_pass(ax, ay, bx, by, True, 0.0)
    area = area + _pairwise_green_pass(bx, by, ax, ay, False, 1e-5)
    return jnp.abs(area)


def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU (N, M). Parity: boxes_iou_bev_gpu."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, EPS, None)


def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3D IoU (N, M): rotated BEV overlap x z-extent overlap.

    Parity: iou3d_nms_utils.boxes_iou3d_gpu (iou3d_nms_utils.py:48-81)
    — yaw-only overlap even for 9-DoF boxes (the reference computes 3D
    IoU on the first 7 dims).
    """
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    overlap_h = jnp.clip(
        jnp.minimum(za2[:, None], zb2[None, :])
        - jnp.maximum(za1[:, None], zb1[None, :]),
        0.0,
        None,
    )
    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, EPS, None)


def boxes_iou_normal(boxes_a, boxes_b):
    """Axis-aligned BEV IoU of rotated boxes' AABBs — parity with
    box_utils.boxes3d_nearest_bev_iou's aligned step combined with
    nms_normal. boxes: (N, 7+)."""
    half_a = boxes_a[:, 3:5] / 2
    half_b = boxes_b[:, 3:5] / 2
    a_min = boxes_a[:, 0:2] - half_a
    a_max = boxes_a[:, 0:2] + half_a
    b_min = boxes_b[:, 0:2] - half_b
    b_max = boxes_b[:, 0:2] + half_b
    lt = jnp.maximum(a_min[:, None], b_min[None])
    rb = jnp.minimum(a_max[:, None], b_max[None])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None]
    return inter / jnp.clip(area_a + area_b - inter, EPS, None)


def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned IoU after snapping each box to its nearest
    axis-aligned orientation (reference box_utils.boxes3d_nearest_bev_iou
    box_utils.py:321) — used by the anchor target assigner."""

    def nearest_aabb(boxes):
        yaw = boxes[:, 6]
        # closer to 0/pi than to ±pi/2 → keep (dx, dy), else swap
        rot = jnp.abs(
            yaw - jnp.floor(yaw / jnp.pi + 0.5) * jnp.pi
        )  # distance to nearest multiple of pi
        swap = rot > (jnp.pi / 4)
        dx = jnp.where(swap, boxes[:, 4], boxes[:, 3])
        dy = jnp.where(swap, boxes[:, 3], boxes[:, 4])
        return jnp.stack(
            [boxes[:, 0], boxes[:, 1], dx, dy], axis=-1
        )

    a = nearest_aabb(boxes_a)
    b = nearest_aabb(boxes_b)
    a_min = a[:, 0:2] - a[:, 2:4] / 2
    a_max = a[:, 0:2] + a[:, 2:4] / 2
    b_min = b[:, 0:2] - b[:, 2:4] / 2
    b_max = b[:, 0:2] + b[:, 2:4] / 2
    lt = jnp.maximum(a_min[:, None], b_min[None])
    rb = jnp.minimum(a_max[:, None], b_max[None])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] * a[:, 3])[:, None]
    area_b = (b[:, 2] * b[:, 3])[None]
    return inter / jnp.clip(area_a + area_b - inter, EPS, None)


def boxes_aligned_iou3d(boxes_a, boxes_b):
    """Elementwise axis-aligned 3D IoU of matched box pairs (N, 7) vs
    (N, 7) → (N,) — reference loss_utils / iou3d aligned variant used
    by the IoU regression loss."""
    a_min = boxes_a[:, 0:3] - boxes_a[:, 3:6] / 2
    a_max = boxes_a[:, 0:3] + boxes_a[:, 3:6] / 2
    b_min = boxes_b[:, 0:3] - boxes_b[:, 3:6] / 2
    b_max = boxes_b[:, 0:3] + boxes_b[:, 3:6] / 2
    lt = jnp.maximum(a_min, b_min)
    rb = jnp.minimum(a_max, b_max)
    whd = jnp.clip(rb - lt, 0.0, None)
    inter = whd[:, 0] * whd[:, 1] * whd[:, 2]
    vol_a = jnp.prod(boxes_a[:, 3:6], axis=-1)
    vol_b = jnp.prod(boxes_b[:, 3:6], axis=-1)
    return inter / jnp.clip(vol_a + vol_b - inter, EPS, None)
