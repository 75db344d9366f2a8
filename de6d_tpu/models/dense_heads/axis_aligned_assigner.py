"""Axis-aligned anchor↔gt target assignment — fully vectorized jnp.

Parity: reference target_assigner/axis_aligned_target_assigner.py
(assign_targets_single, :135-210). The reference loops per batch and
per anchor-class; here the whole (A, M) assignment runs as one masked
computation under vmap:

- IoU between anchors and gts of a *different* class is forced to -1,
  which collapses the per-class loop (each anchor only ever sees its
  own class's gts, each gt's best-anchor search only ranges over its
  class's anchors).
- force-matching (each gt claims its best-overlap anchors) uses the
  per-gt column max with empty gts (max == 0) excluded.
- labels: gt class id for fg (forced ∪ above-matched-threshold), 0 for
  below-unmatched-threshold, -1 in between; all 0 if the sample has no
  valid gts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops import iou3d


def _iou_matrix(anchors, gt_boxes, match_height: bool, chunk: int = 8192):
    if not match_height:
        return iou3d.boxes3d_nearest_bev_iou(anchors, gt_boxes)
    # rotated 3D IoU, chunked over the (large) anchor dim
    a = anchors.shape[0]
    pad = (-a) % chunk
    padded = jnp.pad(anchors, ((0, pad), (0, 0)))
    rows = padded.reshape(-1, chunk, anchors.shape[1])
    out = jax.lax.map(lambda r: iou3d.boxes_iou3d(r, gt_boxes), rows)
    return out.reshape(-1, gt_boxes.shape[0])[:a]


@functools.partial(jax.jit, static_argnames=("box_coder", "match_height"))
def assign_targets(
    anchors,          # (A, 7)
    anchor_group,     # (A,) int32 — class-group per anchor
    matched_thr,      # (A,) float32
    unmatched_thr,    # (A,) float32
    gt_boxes,         # (B, M, 7+1[+2]) last col = class id, zero padded
    box_coder=None,
    match_height: bool = False,
):
    """Returns dict with box_cls_labels (B, A) int32,
    box_reg_targets (B, A, code_size), reg_weights (B, A)."""

    def single(gt):
        ndim = gt.shape[-1] - 1
        gt_box = gt[:, :ndim]
        gt_cls = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(gt[:, :7]) > 0, axis=-1)

        iou = _iou_matrix(anchors[:, :7], gt_box[:, :7], match_height)
        class_ok = (gt_cls[None, :] == anchor_group[:, None] + 1) & gt_valid[None, :]
        iou_eff = jnp.where(class_ok, iou, -1.0)

        anchor_max = jnp.max(iou_eff, axis=1)
        anchor_arg = jnp.argmax(iou_eff, axis=1)
        gt_max = jnp.max(iou_eff, axis=0)  # (M,)
        gt_max_eff = jnp.where(gt_max > 0, gt_max, -2.0)
        forced = jnp.any(
            (iou_eff == gt_max_eff[None, :]) & (iou_eff > 0), axis=1
        )

        pos = anchor_max >= matched_thr
        fg = pos | forced
        label = jnp.where(
            fg,
            gt_cls[anchor_arg],
            jnp.where(anchor_max < unmatched_thr, 0, -1),
        )
        label = jnp.where(jnp.any(gt_valid), label, 0).astype(jnp.int32)

        matched_gt = gt_box[anchor_arg]  # (A, ndim)
        anchors_full = anchors
        if ndim > anchors.shape[-1]:  # 9-DoF gts vs 7-dim anchors:
            # pad anchor pitch/roll with zeros (reference
            # AnchorHeadTemplate.generate_anchors pads to code size)
            anchors_full = jnp.pad(
                anchors, ((0, 0), (0, ndim - anchors.shape[-1]))
            )
        # truncate to the coder's declared width: extra gt dims (pitch/
        # roll on sloped data) are appended after the yaw code and a
        # 7-DoF head's conv_box only predicts code_size channels
        target = box_coder.encode(matched_gt, anchors_full)[
            ..., : box_coder.code_size
        ]
        reg_targets = jnp.where(fg[:, None], target, 0.0)
        reg_weights = fg.astype(jnp.float32)
        return label, reg_targets, reg_weights

    labels, reg_targets, reg_weights = jax.vmap(single)(gt_boxes)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": reg_targets,
        "reg_weights": reg_weights,
    }


# ---------------------------------------------------------------------------
# windowed exact assigner — the train-step fast path
# ---------------------------------------------------------------------------

def choose_window_cells(anchors_grid, gt_size_factor: float = 1.5,
                        margin_m: float = 0.5) -> int:
    """Static window width (cells) that provably covers every anchor
    with IoU > 0 against a gt, assuming gt BEV diagonals stay within
    ``gt_size_factor`` x the largest anchor diagonal (true for every
    shipped dataset; override via TARGET_ASSIGNER_CONFIG.WINDOW_CELLS
    for exotic label distributions).

    nearest-BEV (and rotated-BEV) overlap requires the two centers to
    lie within (diag_a + diag_g) / 2 per axis, so a window of radius
    ceil(((1 + factor)/2 * diag_max + margin) / stride) is exact.
    """
    import numpy as np

    diag = float(
        np.max(np.hypot(anchors_grid[0, 0, :, 3], anchors_grid[0, 0, :, 4]))
    )
    step = min(
        float(anchors_grid[0, 1, 0, 0] - anchors_grid[0, 0, 0, 0]),
        float(anchors_grid[1, 0, 0, 1] - anchors_grid[0, 0, 0, 1]),
    )
    reach = (1.0 + gt_size_factor) / 2.0 * diag + margin_m
    r = int(np.ceil(reach / step))
    return 2 * r + 1


@functools.partial(
    jax.jit,
    static_argnames=("box_coder", "match_height", "window", "method"),
)
def assign_targets_windowed(
    anchors_grid,     # (ny, nx, A_loc, 7) — regular grid (host constant)
    anchor_group,     # (A_loc,) int32
    matched_thr,      # (A_loc,)
    unmatched_thr,    # (A_loc,)
    gt_boxes,         # (B, M, 7+1[+2])
    box_coder=None,
    match_height: bool = False,
    window: int = 37,
    method: str = "loop",
):
    """Bit-exact fast path of :func:`assign_targets` for grid anchors.

    Key fact: anchor↔gt IoU (nearest-BEV or rotated-3D) is nonzero only
    inside a static window of cells around the gt center, so the dense
    (A, M) IoU matrix — 20M entries x several fp32 temporaries per
    KITTI sample, pure HBM traffic on TPU — collapses to M gathered
    (W, W, A_loc) patches (~35x less work). Outside the window the
    dense matrix is exactly 0 (class match) or -1 (class mismatch),
    which this function accounts for in closed form:

    - running (max, argmax) over the window patches is merged with the
      analytic out-of-window base (0 if any valid gt of the anchor's
      class exists, else -1; first such gt index), reproducing
      jnp.argmax's first-max tie rule,
    - per-gt column maxima (force matching) need window entries only,
      since forcing requires IoU > 0,
    - window patches are applied sequentially (fori_loop) with
      strict-greater updates, so overlapping windows resolve exactly
      like the dense scan.

    ``method`` selects the window-application strategy (both exact,
    tested equal): 'loop' = M sequential dynamic-slice patch updates;
    'scatter' = three whole-problem scatters (max of IoU, min of the
    tie index among max attainers, or of the forced flags) — fewer,
    larger ops for hardware where sequential small updates dominate.

    Parity: same contract as assign_targets (reference
    axis_aligned_target_assigner.py:135-210).
    """
    ny, nx, a_loc, _ = anchors_grid.shape
    w = window
    assert w <= nx and w <= ny, "window larger than grid — use dense path"
    x0 = anchors_grid[0, 0, 0, 0]
    y0 = anchors_grid[0, 0, 0, 1]
    x_step = anchors_grid[0, 1, 0, 0] - x0
    y_step = anchors_grid[1, 0, 0, 1] - y0

    iou_one = (
        (lambda a, g: iou3d.boxes_iou3d(a, g[None])[:, 0])
        if match_height
        else (lambda a, g: iou3d.boxes3d_nearest_bev_iou(a, g[None])[:, 0])
    )

    def single(gt):
        ndim = gt.shape[-1] - 1
        m = gt.shape[0]
        gt_box = gt[:, :ndim]
        gt_cls = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(gt[:, :7]) > 0, axis=-1)
        m_idx = jnp.arange(m, dtype=jnp.int32)

        # window starts, clamped so the window stays on the grid
        sx = jnp.clip(
            jnp.round((gt[:, 0] - x0) / x_step).astype(jnp.int32) - w // 2,
            0, nx - w,
        )
        sy = jnp.clip(
            jnp.round((gt[:, 1] - y0) / y_step).astype(jnp.int32) - w // 2,
            0, ny - w,
        )

        # all-window IoUs, vectorized over gts: (M, W, W, A_loc)
        def window_iou(sy_m, sx_m, gt_m, cls_m, valid_m):
            patch = jax.lax.dynamic_slice(
                anchors_grid, (sy_m, sx_m, 0, 0), (w, w, a_loc, 7)
            )
            iou = iou_one(patch.reshape(-1, 7), gt_m[:7]).reshape(
                w, w, a_loc
            )
            class_ok = (cls_m == anchor_group + 1) & valid_m  # (A_loc,)
            return jnp.where(class_ok[None, None, :], iou, -1.0)

        iou_w = jax.vmap(window_iou)(sy, sx, gt_box, gt_cls, gt_valid)

        # per-gt column max: forcing needs IoU > 0, which only window
        # entries can reach (out-of-window entries are exactly 0 / -1)
        gt_max = jnp.max(iou_w, axis=(1, 2, 3))  # (M,)
        gt_max_eff = jnp.where(gt_max > 0, gt_max, -2.0)

        if method == "scatter":
            # three whole-problem scatters instead of M sequential
            # patch updates. warg = FIRST gt index attaining the window
            # max (scatter-min over attainers) — equals the loop's
            # strict-greater chain result wherever the merge below
            # reads it (wmax > base_max).
            a_tot = ny * nx * a_loc
            wy = sy[:, None] + jnp.arange(w, dtype=jnp.int32)  # (M, W)
            wx = sx[:, None] + jnp.arange(w, dtype=jnp.int32)
            cells = wy[:, :, None] * nx + wx[:, None, :]  # (M, W, W)
            rows = (
                cells[..., None] * a_loc
                + jnp.arange(a_loc, dtype=jnp.int32)
            ).reshape(m, -1)  # (M, Wc)
            vals = iou_w.reshape(m, -1)
            flat_rows = rows.reshape(-1)
            wmax_f = jnp.full((a_tot,), -2.0, jnp.float32).at[
                flat_rows
            ].max(vals.reshape(-1))
            is_max = vals == wmax_f[rows]
            cand = jnp.where(is_max, m_idx[:, None], m).astype(jnp.int32)
            warg_f = jnp.full((a_tot,), m, jnp.int32).at[flat_rows].min(
                cand.reshape(-1)
            )
            forced_v = (vals == gt_max_eff[:, None]) & (vals > 0)
            forced_f = jnp.zeros((a_tot,), bool).at[flat_rows].max(
                forced_v.reshape(-1)
            )
            wmax = wmax_f.reshape(ny, nx, a_loc)
            warg = warg_f.reshape(ny, nx, a_loc)
            forced = forced_f.reshape(ny, nx, a_loc)
        else:
            # sequential window application (overlaps resolve like the
            # dense scan); carries are (ny, nx, A_loc) canvases
            wmax0 = jnp.full((ny, nx, a_loc), -2.0, jnp.float32)
            warg0 = jnp.zeros((ny, nx, a_loc), jnp.int32)
            forced0 = jnp.zeros((ny, nx, a_loc), bool)

            def body(i, state):
                wmax, warg, forced = state
                patch = iou_w[i]
                pm = jax.lax.dynamic_slice(wmax, (sy[i], sx[i], 0),
                                           (w, w, a_loc))
                pa = jax.lax.dynamic_slice(warg, (sy[i], sx[i], 0),
                                           (w, w, a_loc))
                pf = jax.lax.dynamic_slice(forced, (sy[i], sx[i], 0),
                                           (w, w, a_loc))
                upd = patch > pm
                pm = jnp.where(upd, patch, pm)
                pa = jnp.where(upd, i, pa)
                pf = pf | ((patch == gt_max_eff[i]) & (patch > 0))
                wmax = jax.lax.dynamic_update_slice(
                    wmax, pm, (sy[i], sx[i], 0)
                )
                warg = jax.lax.dynamic_update_slice(
                    warg, pa, (sy[i], sx[i], 0)
                )
                forced = jax.lax.dynamic_update_slice(
                    forced, pf, (sy[i], sx[i], 0)
                )
                return wmax, warg, forced

            wmax, warg, forced = jax.lax.fori_loop(
                0, m, body, (wmax0, warg0, forced0)
            )

        # analytic out-of-window base per anchor slot: value 0 with the
        # FIRST valid same-class gt if one exists, else -1 (argmax 0)
        exists_cls = jax.vmap(
            lambda g: jnp.any(gt_valid & (gt_cls == g + 1))
        )(anchor_group)  # (A_loc,)
        first_cls = jax.vmap(
            lambda g: jnp.min(
                jnp.where(gt_valid & (gt_cls == g + 1), m_idx, m)
            )
        )(anchor_group)
        base_max = jnp.where(exists_cls, 0.0, -1.0)  # (A_loc,)
        base_arg = jnp.where(exists_cls, first_cls, 0).astype(jnp.int32)

        # merge: ties (only possible at the base value) go to the base,
        # whose index is the global first same-class gt
        anchor_max = jnp.maximum(wmax, base_max[None, None, :])
        anchor_arg = jnp.where(
            wmax > base_max[None, None, :], warg, base_arg[None, None, :]
        )

        pos = anchor_max >= matched_thr[None, None, :]
        fg = pos | forced
        label = jnp.where(
            fg,
            gt_cls[anchor_arg],
            jnp.where(anchor_max < unmatched_thr[None, None, :], 0, -1),
        )
        label = jnp.where(jnp.any(gt_valid), label, 0).astype(jnp.int32)

        label = label.reshape(-1)
        fg = fg.reshape(-1)
        arg = anchor_arg.reshape(-1)
        anchors_flat = anchors_grid.reshape(-1, 7)
        matched_gt = gt_box[arg]  # (A, ndim)
        anchors_full = anchors_flat
        if ndim > 7:
            anchors_full = jnp.pad(anchors_flat, ((0, 0), (0, ndim - 7)))
        target = box_coder.encode(matched_gt, anchors_full)[
            ..., : box_coder.code_size
        ]
        reg_targets = jnp.where(fg[:, None], target, 0.0)
        reg_weights = fg.astype(jnp.float32)
        return label, reg_targets, reg_weights

    labels, reg_targets, reg_weights = jax.vmap(single)(gt_boxes)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": reg_targets,
        "reg_weights": reg_weights,
    }
