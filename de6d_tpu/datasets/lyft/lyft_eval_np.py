"""Lyft Level-5 mAP protocol, devkit-free.

Parity: reference datasets/lyft/lyft_mAP_eval/lyft_eval.py:1-435
(Box3D ground-polygon IoU, per-sample greedy score-ordered matching
with strict `>` threshold and taken-gt→FP semantics, PASCAL envelope
AP integrated over actual recall breakpoints, averaged over the IoU
threshold list) and lyft_utils.format_lyft_results (:319-332).
Cross-validated against the reference file executed pure-python in
tests/test_lyft_eval_vs_reference.py.

Box schema (same as the reference's JSON schema):
  {'sample_token': str, 'translation': [x, y, z],
   'size': [w, l, h], 'rotation': [qw, qx, qy, qz], 'name': str,
   'score': float (predictions only)}
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..eval.rotate_iou_np import rbbox_to_corners, rect_overlap


def _quaternion_yaw_cos_sin(q):
    """First column of the quaternion rotation matrix — exactly the
    cos/sin the reference reads from Quaternion.rotation_matrix."""
    w, x, y, z = [float(v) for v in q]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    cos = 1.0 - s * (y * y + z * z)  # R[0, 0]
    sin = s * (x * y + z * w)        # R[1, 0]
    return cos, sin


def _boxes_to_arrays(box_dicts):
    """list of schema dicts → (bev (N,5)[cx,cy,l,w,yaw], zmin, zmax,
    volume, scores)."""
    n = len(box_dicts)
    bev = np.zeros((n, 5), np.float64)
    zmin = np.zeros(n, np.float64)
    zmax = np.zeros(n, np.float64)
    vol = np.zeros(n, np.float64)
    scores = np.full(n, -1.0, np.float64)
    for i, b in enumerate(box_dicts):
        w, l, h = [float(v) for v in b["size"]]
        cx, cy, cz = [float(v) for v in b["translation"]]
        cos, sin = _quaternion_yaw_cos_sin(b["rotation"])
        bev[i] = (cx, cy, l, w, np.arctan2(sin, cos))
        zmin[i], zmax[i] = cz - h / 2, cz + h / 2
        vol[i] = w * l * h
        scores[i] = float(b.get("score", -1))
    return bev, zmin, zmax, vol, scores


def _iou_3d(pred_arrays, pi, gt_arrays):
    """IoU of prediction `pi` against every gt: BEV polygon
    intersection × height overlap / volume union (reference
    Box3D.get_iou :182-195)."""
    pbev, pzmin, pzmax, pvol, _ = pred_arrays
    gbev, gzmin, gzmax, gvol, _ = gt_arrays
    pc = rbbox_to_corners(pbev[pi : pi + 1])
    gc = rbbox_to_corners(gbev)
    area = rect_overlap(np.broadcast_to(pc, gc.shape), gc)
    hh = np.maximum(
        0.0, np.minimum(pzmax[pi], gzmax) - np.maximum(pzmin[pi], gzmin)
    )
    inter = area * hh
    union = pvol[pi] + gvol - inter
    return np.clip(inter / np.maximum(union, 1e-12), 0.0, 1.0)


def group_by_key(dicts, key):
    groups = defaultdict(list)
    for d in dicts:
        groups[d[key]].append(d)
    return groups


def get_envelope(precisions):
    for i in range(precisions.size - 1, 0, -1):
        precisions[i - 1] = np.maximum(precisions[i - 1], precisions[i])
    return precisions


def get_ap(recalls, precisions):
    recalls = np.concatenate(([0.0], recalls, [1.0]))
    precisions = np.concatenate(([0.0], precisions, [0.0]))
    precisions = get_envelope(precisions)
    i = np.where(recalls[1:] != recalls[:-1])[0]
    return float(np.sum((recalls[i + 1] - recalls[i]) * precisions[i + 1]))


def recall_precision(gt, predictions, iou_threshold_list):
    """Reference recall_precision (:271-342): greedy over predictions
    sorted by score; best-overlap gt taken per threshold; a second hit
    on a taken gt is an FP; strict `>` comparison."""
    num_gts = len(gt)
    if num_gts == 0:
        return -1, -1, -1

    image_gts = group_by_key(gt, "sample_token")
    gt_arrays = {t: _boxes_to_arrays(v) for t, v in image_gts.items()}
    gt_checked = {
        t: np.zeros((len(v), len(iou_threshold_list)))
        for t, v in image_gts.items()
    }

    predictions = sorted(predictions, key=lambda x: x["score"], reverse=True)
    pred_arrays = _boxes_to_arrays(predictions)
    num_predictions = len(predictions)
    tp = np.zeros((num_predictions, len(iou_threshold_list)))
    fp = np.zeros((num_predictions, len(iou_threshold_list)))

    for pi, prediction in enumerate(predictions):
        token = prediction["sample_token"]
        max_overlap = -np.inf
        jmax = -1
        checked = gt_checked.get(token)
        if checked is not None and len(checked):
            overlaps = _iou_3d(pred_arrays, pi, gt_arrays[token])
            max_overlap = float(np.max(overlaps))
            jmax = int(np.argmax(overlaps))
        for i, iou_threshold in enumerate(iou_threshold_list):
            if max_overlap > iou_threshold:
                if checked[jmax, i] == 0:
                    tp[pi, i] = 1.0
                    checked[jmax, i] = 1
                else:
                    fp[pi, i] = 1.0
            else:
                fp[pi, i] = 1.0

    fp = np.cumsum(fp, axis=0)
    tp = np.cumsum(tp, axis=0)
    recalls = tp / float(num_gts)
    precisions = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap_list = [
        get_ap(recalls[:, i], precisions[:, i])
        for i in range(len(iou_threshold_list))
    ]
    return recalls, precisions, ap_list


def get_average_precisions(gt, predictions, class_names, iou_thresholds):
    """Reference get_average_precisions (:345-392): per-class mean AP
    over the IoU threshold list; classes with no predictions score 0."""
    assert all(0 <= t <= 1 for t in iou_thresholds)
    gt_by_class = group_by_key(gt, "name")
    pred_by_class = group_by_key(predictions, "name")
    average_precisions = np.zeros(len(class_names))
    for ci, cls in enumerate(class_names):
        if cls in pred_by_class and cls in gt_by_class:
            _, _, ap_list = recall_precision(
                gt_by_class[cls], pred_by_class[cls], iou_thresholds
            )
            average_precisions[ci] = np.mean(ap_list)
    return average_precisions


def format_lyft_results(classwise_ap, class_names, iou_threshold_list,
                        version="trainval"):
    """Reference lyft_utils.format_lyft_results (:319-332)."""
    ret_dict = {}
    result = "----------------Lyft %s results-----------------\n" % version
    result += "Average precision over IoUs: %s\n" % str(iou_threshold_list)
    for ci, cls in enumerate(class_names):
        result += "{:<20}: \t {:.4f}\n".format(cls, classwise_ap[ci])
        ret_dict[cls] = classwise_ap[ci]
    result += "--------------average performance-------------\n"
    mAP = float(np.mean(classwise_ap))
    result += "mAP:\t {:.4f}\n".format(mAP)
    ret_dict["mAP"] = mAP
    return result, ret_dict


def boxes_lidar_to_schema(boxes, names, sample_token, scores=None):
    """(N, 7+) lidar boxes [x y z dx dy dz yaw ...] → schema dicts.

    The metric is rigid-frame invariant, so evaluating in the lidar
    frame is equivalent to the reference's global frame (which it only
    reaches through devkit pose tables). size follows the reference's
    [w, l, h] order; rotation is the pure-yaw quaternion."""
    out = []
    for i, b in enumerate(np.asarray(boxes, np.float64)):
        d = {
            "sample_token": sample_token,
            "translation": [b[0], b[1], b[2]],
            "size": [b[4], b[3], b[5]],
            "rotation": [np.cos(b[6] / 2), 0.0, 0.0, np.sin(b[6] / 2)],
            "name": str(names[i]),
        }
        if scores is not None:
            d["score"] = float(scores[i])
        out.append(d)
    return out
