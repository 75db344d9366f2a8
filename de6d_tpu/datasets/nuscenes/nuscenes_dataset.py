"""NuScenes dataset adapter.

Parity: reference datasets/nuscenes/nuscenes_dataset.py (:374) +
nuscenes_utils.py (:500): infos-pkl ingest, multi-sweep accumulation
with per-point time lag, velocity columns in gt boxes (cols 7:9), and
official nuscenes-devkit evaluation when the devkit is installed
(guarded import — absent in this image, evaluation falls back to a
simple distance-matched AP summary).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ...registry import DATASETS
from ..dataset import DatasetTemplate


@DATASETS.register
class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.infos = []
        self.max_sweeps = int(dataset_cfg.get("MAX_SWEEPS", 10))
        for info_path in dataset_cfg["INFO_PATH"][self.mode]:
            path = self.root_path / info_path
            if not path.exists():
                if logger:
                    logger.warning(f"nuscenes infos missing: {path}")
                continue
            with open(path, "rb") as f:
                self.infos.extend(pickle.load(f))
        if dataset_cfg.get("BALANCED_RESAMPLING", False) and training:
            self.infos = self.balanced_infos_resampling(self.infos)

    def balanced_infos_resampling(self, infos):
        """Class-balanced duplication (reference :63-92)."""
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info.get("gt_names", [])):
                if name in cls_infos:
                    cls_infos[name].append(info)
        duplicated = [i for v in cls_infos.values() for i in v]
        return duplicated if duplicated else infos

    def get_sweep(self, sweep_info):
        lidar_path = self.root_path / sweep_info["lidar_path"]
        points = np.fromfile(
            str(lidar_path), dtype=np.float32
        ).reshape(-1, 5)[:, :4]
        points[:, :3] = (
            points[:, :3] @ sweep_info["sweep2lidar_rotation"].T
            + sweep_info["sweep2lidar_translation"]
        )
        times = sweep_info["time_lag"] * np.ones((points.shape[0], 1))
        return points, times

    def get_lidar_with_sweeps(self, index):
        info = self.infos[index]
        lidar_path = self.root_path / info["lidar_path"]
        points = np.fromfile(
            str(lidar_path), dtype=np.float32
        ).reshape(-1, 5)[:, :4]
        sweep_points = [points]
        sweep_times = [np.zeros((points.shape[0], 1))]
        for sweep_info in info.get("sweeps", [])[: self.max_sweeps - 1]:
            p, t = self.get_sweep(sweep_info)
            sweep_points.append(p)
            sweep_times.append(t)
        points = np.concatenate(sweep_points)
        times = np.concatenate(sweep_times)
        return np.concatenate([points, times], axis=-1).astype(np.float32)

    def __len__(self):
        return len(self.infos)

    def getitem_prepared(self, index, rng=None):
        info = self.infos[index]
        points = self.get_lidar_with_sweeps(index)
        input_dict = {
            "points": points,
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {"token": info.get("token")},
        }
        if "gt_boxes" in info:
            input_dict["gt_names"] = info["gt_names"]
            input_dict["gt_boxes"] = info["gt_boxes"]
        out = self.prepare_data(input_dict, rng)
        if out is None:
            return None
        out.pop("metadata", None)
        out["frame_id"] = input_dict["frame_id"]
        return out

    def __getitem__(self, index):
        out = self.getitem_prepared(index)
        if out is None:
            return self.__getitem__(np.random.randint(len(self)))
        return out

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        annos = []
        for i, box_dict in enumerate(pred_dicts):
            boxes = np.asarray(box_dict["pred_boxes"])
            annos.append(
                {
                    "frame_id": batch_dict["frame_id"][i],
                    "name": np.array(class_names)[
                        np.asarray(box_dict["pred_labels"]) - 1
                    ] if boxes.shape[0] else np.zeros(0),
                    "score": np.asarray(box_dict["pred_scores"]),
                    "boxes_lidar": boxes,
                }
            )
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        # official nuScenes detection metric, devkit-free (mAP over
        # center-distance thresholds + ATE/ASE/AOE/AVE + NDS) — see
        # nuscenes_eval.py
        from .nuscenes_eval import evaluate_nuscenes

        by_frame = {a["frame_id"]: a for a in det_annos}
        gts, dets = [], []
        for info in self.infos:
            fid = Path(info["lidar_path"]).stem
            gts.append({
                "gt_boxes": info.get("gt_boxes", np.zeros((0, 9))),
                "gt_names": info.get("gt_names", np.array([])),
            })
            d = by_frame.get(fid)
            if d is None:
                dets.append({
                    "boxes_lidar": np.zeros((0, 9)),
                    "score": np.zeros((0,)),
                    "name": np.array([]),
                })
            else:
                dets.append(d)
        return evaluate_nuscenes(gts, dets, class_names)

    def _simple_eval(self, det_annos, class_names):
        matched, total_gt, total_det = 0, 0, 0
        by_frame = {a["frame_id"]: a for a in det_annos}
        for info in self.infos:
            fid = Path(info["lidar_path"]).stem
            gt = info.get("gt_boxes", np.zeros((0, 7)))
            det = by_frame.get(fid)
            total_gt += len(gt)
            if det is None or len(det["boxes_lidar"]) == 0 or len(gt) == 0:
                continue
            total_det += len(det["boxes_lidar"])
            d = np.linalg.norm(
                gt[:, None, :2] - det["boxes_lidar"][None, :, :2], axis=-1
            )
            matched += int((d.min(axis=1) < 2.0).sum())
        recall = matched / max(total_gt, 1)
        return f"center-dist(2m) recall: {recall:.4f}", {
            "recall/center_2m": recall
        }
