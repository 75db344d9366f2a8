"""Lyft Level-5 dataset adapter.

Parity: reference datasets/lyft/lyft_dataset.py (:347) + lyft_utils
(:332) + lyft_mAP_eval (:435): infos ingest, multi-sweep points, and
the full Lyft mAP protocol (lyft_eval_np, devkit-free, cross-validated
against the reference's lyft_eval.py run pure-python)."""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ...registry import DATASETS
from ..nuscenes.nuscenes_dataset import NuScenesDataset


@DATASETS.register
class LyftDataset(NuScenesDataset):
    """Lyft shares the nuscenes info schema (the reference's adapters
    differ mainly in the eval protocol and sweep handling)."""

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

    def evaluation(self, det_annos, class_names, **kwargs):
        """Lyft mAP over EVAL_LYFT_IOU_LIST (reference
        lyft_dataset.py:189-204 lyft_eval)."""
        from .lyft_eval_np import (
            boxes_lidar_to_schema, format_lyft_results,
            get_average_precisions,
        )

        iou_thresholds = list(
            self.dataset_cfg.get("EVAL_LYFT_IOU_LIST", [0.5])
        )
        by_frame = {a["frame_id"]: a for a in det_annos}
        gt_list, det_list = [], []
        for info in self.infos:
            fid = Path(info["lidar_path"]).stem
            gt_list += boxes_lidar_to_schema(
                info.get("gt_boxes", np.zeros((0, 7))),
                info.get("gt_names", np.array([])), fid,
            )
            d = by_frame.get(fid)
            if d is not None and len(d["boxes_lidar"]):
                det_list += boxes_lidar_to_schema(
                    d["boxes_lidar"], d["name"], fid, scores=d["score"]
                )
        aps = get_average_precisions(
            gt_list, det_list, class_names, iou_thresholds
        )
        return format_lyft_results(
            aps, class_names, iou_thresholds,
            version=self.dataset_cfg.get("VERSION", "trainval"),
        )
