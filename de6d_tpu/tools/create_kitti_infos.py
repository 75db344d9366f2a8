"""Dataset preprocessing CLI: infos pkl + gt database.

Parity: reference `python -m pcdet.datasets.kitti.kitti_dataset
create_kitti_infos` (kitti_dataset.py:428-466) and the slopedkitti
twin (make_slope.py:249-258 postprocess step).

Usage:
  python -m de6d_tpu.tools.create_kitti_infos \
      --dataset kitti --data_path data/kitti \
      --dataset_cfg configs/dataset_configs/kitti_dataset.yaml
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

from ..config import Config, cfg_from_yaml_file
from ..datasets.kitti.kitti_dataset import KittiDataset
from ..datasets.slopedkitti.slopedkitti_dataset import SlopedKittiDataset


def create_infos(dataset_cls, dataset_cfg, class_names, data_path,
                 workers=8):
    data_path = Path(data_path)
    splits = {"train": "train", "val": "val"}
    info_paths = {}
    for split, name in splits.items():
        dataset = dataset_cls(
            dataset_cfg=dataset_cfg, class_names=class_names,
            root_path=data_path, training=(split == "train"),
        )
        dataset.split = name
        split_file = data_path / "ImageSets" / f"{name}.txt"
        if not split_file.exists():
            print(f"skip split {name}: {split_file} missing")
            continue
        dataset.sample_id_list = [
            x.strip() for x in open(split_file).readlines()
        ]
        infos = dataset.get_infos(
            num_workers=workers, has_label=True, count_inside_pts=True
        )
        out = data_path / f"kitti_infos_{name}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        info_paths[name] = out
        print(f"{name}: {len(infos)} infos → {out}")

    if "train" in info_paths:
        dataset = dataset_cls(
            dataset_cfg=dataset_cfg, class_names=class_names,
            root_path=data_path, training=False,
        )
        db = dataset.create_groundtruth_database(
            info_paths["train"], used_classes=class_names, split="train"
        )
        print(f"gt database → {db}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["kitti", "slopedkitti"],
                    default="kitti")
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--dataset_cfg", default=None)
    ap.add_argument("--classes", nargs="+",
                    default=["Car", "Pedestrian", "Cyclist"])
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    if args.dataset_cfg:
        dataset_cfg = cfg_from_yaml_file(args.dataset_cfg)
    else:
        default = (
            "configs/dataset_configs/kitti_dataset.yaml"
            if args.dataset == "kitti"
            else "configs/dataset_configs/slopedkitti_dataset.yaml"
        )
        dataset_cfg = cfg_from_yaml_file(default)
    # infos generation runs without augmentation
    dataset_cfg.pop("DATA_AUGMENTOR", None)

    cls = KittiDataset if args.dataset == "kitti" else SlopedKittiDataset
    create_infos(
        cls, Config(dataset_cfg), args.classes, args.data_path, args.workers
    )


if __name__ == "__main__":
    main()
