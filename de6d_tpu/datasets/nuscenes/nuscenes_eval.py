"""Devkit-free nuScenes detection metric.

Parity: the official nuscenes-devkit detection evaluation consumed by
the reference (nuscenes_dataset.evaluation :198 →
nuscenes_eval.NuScenesEval): per-class center-distance matching at
thresholds {0.5, 1, 2, 4} m, 101-point interpolated AP clipped at
(min_recall 0.1, min_precision 0.1), cumulative-mean TP errors
(ATE trans, ASE 1-IoU of aligned sizes, AOE yaw — period π for
barriers, AVE velocity) at the 2 m threshold, and
NDS = (5·mAP + Σ (1−min(1, err))) / (5 + #tp_metrics).

Deviation (documented): AAE (attribute error) needs per-box attribute
labels; when absent from the annos it is excluded from NDS rather
than guessed (the devkit fills predicted attributes from a prior
histogram).
"""

from __future__ import annotations

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_RECALL = 101


def _accumulate(gt_list, det_list, dist_th, yaw_period=2 * np.pi):
    """One class, one threshold → dict of curves on the recall grid.

    gt_list: per-frame (G, 9) boxes [x y z dx dy dz yaw vx vy];
    det_list: per-frame dict(boxes (D, 9), scores (D,)).
    """
    npos = sum(len(g) for g in gt_list)
    rows = []  # (score, is_tp, trans, scale, orient, vel)
    for g, d in zip(gt_list, det_list):
        boxes, scores = d["boxes"], d["scores"]
        order = np.argsort(-scores)
        taken = np.zeros(len(g), bool)
        for i in order:
            db = boxes[i]
            if len(g) == 0:
                rows.append((scores[i], 0, 0, 0, 0, 0))
                continue
            dist = np.linalg.norm(g[:, :2] - db[None, :2], axis=-1)
            dist = np.where(taken, np.inf, dist)
            j = int(np.argmin(dist))
            if dist[j] <= dist_th:
                taken[j] = True
                gb = g[j]
                trans = float(np.linalg.norm(gb[:2] - db[:2]))
                # ASE: 1 - IoU of aligned (center+yaw matched) boxes
                inter = np.prod(np.minimum(gb[3:6], db[3:6]))
                union = (
                    np.prod(gb[3:6]) + np.prod(db[3:6]) - inter
                )
                scale = 1.0 - inter / max(union, 1e-9)
                period = yaw_period
                diff = (db[6] - gb[6] + period / 2) % period - period / 2
                orient = abs(float(diff))
                vel = (
                    float(np.linalg.norm(gb[7:9] - db[7:9]))
                    if gb.shape[0] >= 9 and db.shape[0] >= 9 else 0.0
                )
                rows.append((scores[i], 1, trans, scale, orient, vel))
            else:
                rows.append((scores[i], 0, 0, 0, 0, 0))
    if npos == 0 or not rows:
        return None
    rows.sort(key=lambda r: -r[0])
    arr = np.asarray(rows, np.float64)
    tp = arr[:, 1]
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    rec = tp_cum / npos

    rec_grid = np.linspace(0, 1, N_RECALL)
    prec_i = np.interp(rec_grid, rec, prec, right=0)
    conf_i = np.interp(rec_grid, rec, arr[:, 0], right=0)

    out = {"precision": prec_i, "confidence": conf_i,
           "max_recall_ind": int(
               np.clip(np.floor(rec[-1] * (N_RECALL - 1)), 0, N_RECALL - 1)
           )}
    # cumulative-mean TP error curves over matches only
    m = tp.astype(bool)
    if m.sum():
        match_rec = rec[m]
        for k, name in ((2, "trans_err"), (3, "scale_err"),
                        (4, "orient_err"), (5, "vel_err")):
            cmean = np.cumsum(arr[m, k]) / np.arange(1, m.sum() + 1)
            out[name] = np.interp(
                rec_grid, match_rec, cmean, right=float(cmean[-1])
            )
    else:
        for name in ("trans_err", "scale_err", "orient_err", "vel_err"):
            out[name] = np.ones(N_RECALL)
    return out


def _calc_ap(md):
    prec = md["precision"].copy()
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def _calc_tp(md, name):
    first = round(100 * MIN_RECALL) + 1
    last = md["max_recall_ind"]
    if last < first:
        return 1.0
    return float(np.mean(md[name][first:last + 1]))


def evaluate_nuscenes(gt_annos, det_annos, class_names):
    """gt_annos/det_annos: per-frame dicts with
    gt: {'gt_boxes' (G, 7|9), 'gt_names' (G,)};
    det: {'boxes_lidar' (D, 7|9), 'score' (D,), 'name' (D,)}.
    Returns (result_str, metric_dict)."""
    metric = {}
    ap_all, tp_all = [], {k: [] for k in
                          ("trans_err", "scale_err", "orient_err",
                           "vel_err")}
    lines = []
    for cls in class_names:
        gt_list, det_list = [], []
        for g, d in zip(gt_annos, det_annos):
            gm = np.asarray(g["gt_names"]) == cls
            gb = np.asarray(g["gt_boxes"], np.float64)[gm]
            if gb.shape[1] < 9:
                gb = np.pad(gb, ((0, 0), (0, 9 - gb.shape[1])))
            dm = np.asarray(d["name"]) == cls
            db = np.asarray(d["boxes_lidar"], np.float64)[dm]
            if db.size and db.shape[1] < 9:
                db = np.pad(db, ((0, 0), (0, 9 - db.shape[1])))
            det_list.append({
                "boxes": db.reshape(-1, max(9, db.shape[1] if db.size else 9)),
                "scores": np.asarray(d["score"], np.float64)[dm],
            })
            gt_list.append(gb)

        # devkit conventions: barriers wrap yaw at pi; cones have no
        # orientation/velocity, barriers no velocity
        yaw_period = np.pi if cls == "barrier" else 2 * np.pi
        excluded = set()
        if cls == "traffic_cone":
            excluded |= {"orient_err", "vel_err"}
        if cls == "barrier":
            excluded |= {"vel_err"}

        aps = []
        for th in DIST_THRESHOLDS:
            md = _accumulate(gt_list, det_list, th, yaw_period)
            ap = _calc_ap(md) if md is not None else 0.0
            metric[f"{cls}/AP@{th}"] = ap
            aps.append(ap)
        cls_ap = float(np.mean(aps))
        metric[f"{cls}/AP"] = cls_ap
        ap_all.append(cls_ap)

        md2 = _accumulate(gt_list, det_list, TP_THRESHOLD, yaw_period)
        for name in tp_all:
            if name in excluded:
                continue
            err = _calc_tp(md2, name) if md2 is not None else 1.0
            metric[f"{cls}/{name}"] = err
            tp_all[name].append(err)
        lines.append(
            f"{cls}: AP {cls_ap:.4f} "
            f"ATE {metric.get(f'{cls}/trans_err', float('nan')):.3f} "
            f"ASE {metric.get(f'{cls}/scale_err', float('nan')):.3f} "
            f"AOE {metric.get(f'{cls}/orient_err', float('nan')):.3f}"
        )

    mAP = float(np.mean(ap_all)) if ap_all else 0.0
    # devkit aggregate TP errors (class-mean): mATE/mASE/mAOE/mAVE
    agg_names = {"trans_err": "mATE", "scale_err": "mASE",
                 "orient_err": "mAOE", "vel_err": "mAVE"}
    tp_scores = []
    for name, vals in tp_all.items():
        mean_err = float(np.mean(vals)) if vals else 1.0
        metric[agg_names[name]] = mean_err
        tp_scores.append(1.0 - min(1.0, mean_err))
    nds = (5.0 * mAP + sum(tp_scores)) / (5.0 + len(tp_scores))
    metric["mAP"] = mAP
    metric["NDS"] = nds
    lines.append(f"mAP: {mAP:.4f}  NDS: {nds:.4f}")
    return "\n".join(lines), metric
