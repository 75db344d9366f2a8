"""Pandaset dataset adapter.

Parity: reference datasets/pandaset/pandaset_dataset.py (:489). Two
ingest modes:
- native pandaset layout (dataset/<seq>/lidar/XX.pkl.gz + poses.json +
  annotations/cuboids) read SDK-free via pandaset_utils (the
  reference needs the pandaset SDK for the same);
- preprocessed per-frame npy infos.
The reference's own evaluation returns an empty result ("no official
eval", :437-445); ours reports a distance-matched recall summary
instead. create_pandaset_infos / gt-database live here too.
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

    def _pose(self, info):
        from . import pandaset_utils as pu

        seq_dir = self.root_path / "dataset" / info["sequence"]
        poses = pu.load_poses(seq_dir)
        return poses[info["frame_idx"]]

    def getitem_prepared(self, index, rng=None):
        info = self.infos[index]
        lidar_path = str(info["lidar_path"])
        if lidar_path.endswith((".pkl", ".pkl.gz")):
            # native pandaset layout (SDK-free ingest)
            from . import pandaset_utils as pu

            pose = self._pose(info)
            device = int(self.dataset_cfg.get("LIDAR_DEVICE", 0))
            points = pu.get_lidar_points(
                self.root_path / lidar_path, pose, device
            )
            input_dict = {
                "points": points,
                "frame_id": info.get("frame_id", str(index)),
            }
            if "cuboids_path" in info:
                boxes, names, _ = pu.get_annotations(
                    self.root_path / info["cuboids_path"], pose,
                    category_map=self.dataset_cfg.get(
                        "TRAINING_CATEGORIES", {}
                    ),
                    device=device,
                )
                input_dict["gt_boxes"] = boxes
                input_dict["gt_names"] = names
        else:
            points = np.load(
                str(self.root_path / lidar_path)
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


    def get_infos(self, sequences=None):
        """Per-frame infos from the native layout (reference
        get_infos :358-384)."""
        from . import pandaset_utils as pu

        if sequences is None:
            ds_dir = self.root_path / "dataset"
            sequences = sorted(
                p.name for p in ds_dir.iterdir() if p.is_dir()
            ) if ds_dir.exists() else []
        return pu.get_sequence_infos(self.root_path, sequences)

    def create_groundtruth_database(self, info_path, used_classes=None,
                                    split="train"):
        """Object cutouts + dbinfos (reference :386-434)."""
        import pickle as pkl

        from . import pandaset_utils as pu
        from ...utils import box_np_ops

        db_path = self.root_path / (
            "gt_database" if split == "train" else f"gt_database_{split}"
        )
        db_path.mkdir(parents=True, exist_ok=True)
        with open(info_path, "rb") as f:
            infos = pkl.load(f)
        all_db = {}
        for info in infos:
            pose = self._pose(info)
            device = int(self.dataset_cfg.get("LIDAR_DEVICE", 0))
            points = pu.get_lidar_points(
                self.root_path / info["lidar_path"], pose, device
            )
            boxes, names, _ = pu.get_annotations(
                self.root_path / info["cuboids_path"], pose,
                category_map=self.dataset_cfg.get(
                    "TRAINING_CATEGORIES", {}
                ),
                device=device,
            )
            for i in range(boxes.shape[0]):
                if used_classes is not None and names[i] not in used_classes:
                    continue
                box9 = np.concatenate([boxes[i], [0.0, 0.0]])
                mask = box_np_ops.in_hull_obb(points[:, :3], box9)
                obj = points[mask].copy()
                obj[:, :3] -= boxes[i, :3]
                safe = str(names[i]).replace("/", "").replace(" ", "")
                fname = f"{info['frame_id']}_{safe}_{i}.bin"
                obj.astype(np.float32).tofile(db_path / fname)
                all_db.setdefault(names[i], []).append({
                    "name": names[i],
                    "path": str((db_path / fname).relative_to(
                        self.root_path
                    )),
                    "gt_idx": i,
                    "box3d_lidar": boxes[i],
                    "num_points_in_gt": int(mask.sum()),
                    "difficulty": -1,
                })
        out = self.root_path / f"pandaset_dbinfos_{split}.pkl"
        with open(out, "wb") as f:
            pkl.dump(all_db, f)
        return out
