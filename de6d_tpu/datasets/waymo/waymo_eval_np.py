"""Devkit-free Waymo detection metric (mAP / mAPH, L1/L2).

Parity: the official WOD detection metrics the reference invokes
through TensorFlow (datasets/waymo/waymo_eval.py:246
OpenPCDetWaymoDetectionMetricsEstimator): per-class AP at 3D-IoU
thresholds (Vehicle 0.7, Pedestrian/Cyclist 0.5, Sign 0.5), the
heading-weighted APH variant (each TP contributes
min(|Δheading|, 2π−|Δheading|) → weight (1 − Δ/π) … WOD uses
1 − |Δ|/π applied to the TP count), and the L1/L2 difficulty split
(L2 = boxes with ≤5 lidar points or labeled level 2).

Deviation (documented): the official implementation integrates
precision over a recall grid after "max-precision to the right"
smoothing with score cutoffs derived per class; here the standard
101-point interpolated AP is used — equal in the limit and within
noise of the official breakdown.

Breakdown semantics (matches WOD): matching runs once against ALL
gts; for the LEVEL_1 breakdown, detections whose best match is a
LEVEL_2-only gt are IGNORED (dropped from the ranking) rather than
counted as false positives, mirroring the official don't-care
handling of out-of-breakdown ground truths.
"""

from __future__ import annotations

import numpy as np

from ...ops import iou3d

IOU_THRESHOLDS = {
    "Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5, "Sign": 0.5,
    # kitti-style aliases so synthetic sets evaluate too
    "Car": 0.7,
}


def _match_class(gt_list, det_list, iou_thresh):
    """Global score-sorted greedy matching by 3D IoU against ALL gts.
    Returns rows (score, tp, heading_sim, matched_gt_is_l2) + npos
    counts for both levels."""
    import jax.numpy as jnp

    rows = []
    npos_all = npos_l1 = 0
    for g, d in zip(gt_list, det_list):
        npos_all += len(g["boxes"])
        npos_l1 += int((~g["is_l2"]).sum())
        if not len(d["boxes"]):
            continue
        order = np.argsort(-d["scores"])
        if len(g["boxes"]):
            iou = np.asarray(iou3d.boxes_iou3d(
                jnp.asarray(d["boxes"][:, :7], jnp.float32),
                jnp.asarray(g["boxes"][:, :7], jnp.float32),
            ))
        taken = np.zeros(len(g["boxes"]), bool)
        for i in order:
            if not len(g["boxes"]):
                rows.append((d["scores"][i], 0, 0.0, False))
                continue
            row = np.where(taken, -1.0, iou[i])
            j = int(np.argmax(row))
            if row[j] >= iou_thresh:
                taken[j] = True
                diff = abs(
                    float(d["boxes"][i, 6]) - float(g["boxes"][j, 6])
                ) % (2 * np.pi)
                diff = min(diff, 2 * np.pi - diff)
                rows.append(
                    (d["scores"][i], 1, 1.0 - diff / np.pi,
                     bool(g["is_l2"][j]))
                )
            else:
                rows.append((d["scores"][i], 0, 0.0, False))
    return rows, npos_all, npos_l1


def _ap_from_rows(rows, npos, heading=False):
    if npos == 0 or not rows:
        return 0.0
    rows = sorted(rows, key=lambda r: -r[0])
    arr = np.asarray([r[:3] for r in rows], np.float64)
    tp = arr[:, 2] if heading else arr[:, 1]
    hit = arr[:, 1]
    tp_cum = np.cumsum(tp)
    hit_cum = np.cumsum(hit)
    fp_cum = np.cumsum(1.0 - hit)
    prec = tp_cum / np.maximum(hit_cum + fp_cum, 1e-9)
    rec = hit_cum / npos
    grid = np.linspace(0, 1, 101)
    prec_i = np.interp(grid, rec, prec, right=0)
    # right-max smoothing (standard interpolated AP)
    for i in range(len(prec_i) - 2, -1, -1):
        prec_i[i] = max(prec_i[i], prec_i[i + 1])
    return float(np.mean(prec_i))


def evaluate_waymo(gt_annos, det_annos, class_names):
    """gt_annos: per-frame {'gt_boxes' (G,7+), 'name' (G,),
    'num_points_in_gt' (G,) optional, 'difficulty' (G,) optional};
    det_annos: per-frame {'boxes_lidar', 'score', 'name'}."""
    metric, lines = {}, []
    for cls in class_names:
        th = IOU_THRESHOLDS.get(cls, 0.5)
        gt_list, det_list = [], []
        for g, d in zip(gt_annos, det_annos):
            names = np.asarray(g["name"])
            m = names == cls
            boxes = np.asarray(g["gt_boxes"], np.float64)[m]
            npts = np.asarray(
                g.get("num_points_in_gt", np.full(len(names), 99))
            )[m]
            diff = np.asarray(
                g.get("difficulty", np.zeros(len(names)))
            )[m]
            gt_list.append(
                {"boxes": boxes, "is_l2": (npts <= 5) | (diff == 2)}
            )
            dm = np.asarray(d["name"]) == cls
            det_list.append({
                "boxes": np.asarray(d["boxes_lidar"], np.float64)[dm],
                "scores": np.asarray(d["score"], np.float64)[dm],
            })
        rows, npos_all, npos_l1 = _match_class(gt_list, det_list, th)
        # LEVEL_1: detections matched to L2-only gts are don't-care
        rows_l1 = [r for r in rows if not (r[1] and r[3])]
        for level, lrows, npos in (
            ("LEVEL_1", rows_l1, npos_l1),
            ("LEVEL_2", rows, npos_all),
        ):
            ap = _ap_from_rows(lrows, npos)
            aph = _ap_from_rows(lrows, npos, heading=True)
            metric[f"{cls}/{level}/AP"] = ap
            metric[f"{cls}/{level}/APH"] = aph
            lines.append(
                f"{cls} {level}: AP {ap:.4f} APH {aph:.4f}"
            )
    return "\n".join(lines), metric
