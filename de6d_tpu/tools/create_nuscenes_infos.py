"""NuScenes preprocessing CLI: infos pkl + gt database, devkit-free.

Parity: reference `python -m pcdet.datasets.nuscenes.nuscenes_dataset
--func create_nuscenes_infos` (nuscenes_dataset.py:300-374) — the
devkit NuScenes() database is replaced by the raw JSON-table reader in
nuscenes_tables.py. The Lyft dataset shares the table schema and can
be ingested with --version pointing at its data dir.

Usage:
  python -m de6d_tpu.tools.create_nuscenes_infos \
      --data_path data/nuscenes --version v1.0-trainval \
      [--train_scenes scene-0001 scene-0002 ...] [--max_sweeps 10]
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

from ..datasets.nuscenes.nuscenes_tables import (
    NuScenesTables, fill_trainval_infos,
)
from ..utils import box_np_ops


def create_groundtruth_database(data_path, infos, used_classes=None,
                                max_sweeps=10):
    """Per-class object cutouts + dbinfos pkl (reference
    nuscenes_dataset.create_groundtruth_database)."""
    data_path = Path(data_path)
    db_path = data_path / f"gt_database_{max_sweeps}sweeps_withvelo"
    db_info_path = (
        data_path / f"nuscenes_dbinfos_{max_sweeps}sweeps_withvelo.pkl"
    )
    db_path.mkdir(exist_ok=True)
    all_db_infos = {}
    for info in infos:
        lidar = data_path / info["lidar_path"]
        if not lidar.exists():
            continue
        points = np.fromfile(str(lidar), np.float32).reshape(-1, 5)[:, :4]
        gt_boxes = info.get("gt_boxes", np.zeros((0, 9)))
        names = info.get("gt_names", np.array([]))
        for i in range(len(gt_boxes)):
            if used_classes is not None and names[i] not in used_classes:
                continue
            box7 = gt_boxes[i, :7]
            box9 = np.concatenate([box7, [0.0, 0.0]])
            mask = box_np_ops.in_hull_obb(points[:, :3], box9)
            obj = points[mask].copy()
            obj[:, :3] -= box7[:3]
            fname = f"{info['token']}_{names[i]}_{i}.bin"
            obj.astype(np.float32).tofile(db_path / fname)
            all_db_infos.setdefault(names[i], []).append({
                "name": names[i],
                "path": str((db_path / fname).relative_to(data_path)),
                "image_idx": info["token"],
                "gt_idx": i,
                "box3d_lidar": gt_boxes[i],
                "num_points_in_gt": int(mask.sum()),
            })
    with open(db_info_path, "wb") as f:
        pickle.dump(all_db_infos, f)
    return db_info_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--max_sweeps", type=int, default=10)
    ap.add_argument("--train_scenes", nargs="*", default=None,
                    help="scene names for the train split (default: "
                         "all scenes)")
    ap.add_argument("--with_gt_database", action="store_true")
    args = ap.parse_args()

    tables = NuScenesTables(args.data_path, args.version)
    train, val = fill_trainval_infos(
        args.data_path, tables,
        train_scene_names=args.train_scenes,
        max_sweeps=args.max_sweeps,
    )
    root = Path(args.data_path)
    tr_path = root / (
        f"nuscenes_infos_{args.max_sweeps}sweeps_train.pkl"
    )
    va_path = root / f"nuscenes_infos_{args.max_sweeps}sweeps_val.pkl"
    with open(tr_path, "wb") as f:
        pickle.dump(train, f)
    with open(va_path, "wb") as f:
        pickle.dump(val, f)
    print(f"train: {len(train)} → {tr_path}")
    print(f"val: {len(val)} → {va_path}")
    if args.with_gt_database:
        db = create_groundtruth_database(
            args.data_path, train, max_sweeps=args.max_sweeps
        )
        print(f"gt database → {db}")


if __name__ == "__main__":
    main()
