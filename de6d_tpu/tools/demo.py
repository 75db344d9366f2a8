"""Demo CLI: run a model over a directory of point clouds.

Parity: reference core/tools/demo.py (:25-115 DemoDataset + loop):
globs ``*.bin``/``*.npy``, runs inference, and renders/saves
detections. The open3d/mayavi window becomes a matplotlib BEV render
(utils/viz_utils.py) + a JSON dump per frame.

Usage:
  python -m de6d_tpu.tools.demo --cfg_file configs/kitti_models/pointpillar.yaml \
      --ckpt <ckpt_dir> --data_path data/kitti/testing/velodyne --out demo_out
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from ..config import cfg, cfg_from_yaml_file
from ..models import build_network
from ..models.detectors.detector3d_template import DatasetSpec
from ..serving import StreamingDetector
from ..train import build_optimizer_and_schedule, create_train_state
from ..train.checkpoint import restore_checkpoint
from ..utils import viz_utils
from ..utils.common_utils import create_logger


def load_cloud(path: Path):
    if path.suffix == ".bin":
        return np.fromfile(str(path), dtype=np.float32).reshape(-1, 4)
    if path.suffix == ".npy":
        return np.load(str(path))
    raise ValueError(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--ext", default=".bin")
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--max_points", type=int, default=16384)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = create_logger()
    dp = cfg.DATA_CONFIG
    vox = next(
        (p for p in dp.DATA_PROCESSOR
         if p["NAME"] == "transform_points_to_voxels"), None,
    )
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=len(
            dp.POINT_FEATURE_ENCODING["used_feature_list"]
        ),
        point_cloud_range=tuple(dp.POINT_CLOUD_RANGE),
        voxel_size=tuple(vox["VOXEL_SIZE"]) if vox else (0.16, 0.16, 4.0),
        max_voxels=16000,
        max_points_per_voxel=int(vox["MAX_POINTS_PER_VOXEL"]) if vox else 32,
    )
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=spec
    )
    sample = {
        "points": np.zeros((1, args.max_points, spec.point_feature_dim),
                           np.float32),
        "points_mask": np.ones((1, args.max_points), bool),
    }
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, train=False)
    )(jax.random.PRNGKey(0), dict(sample))
    if args.ckpt:
        optimizer, _ = build_optimizer_and_schedule(
            cfg.OPTIMIZATION, variables["params"], steps_per_epoch=1
        )
        state = create_train_state(model, optimizer, sample)
        state, _ = restore_checkpoint(args.ckpt, state)
        variables = {
            "params": state.params, "batch_stats": state.batch_stats,
        }
        logger.info(f"loaded {args.ckpt}")

    detector = StreamingDetector(
        model, variables, cfg.MODEL, len(cfg.CLASS_NAMES),
        max_points=args.max_points,
    )
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(args.data_path).glob(f"*{args.ext}"))
    logger.info(f"{len(files)} frames")
    for f in files:
        cloud = load_cloud(f)
        det = detector.detect(cloud)
        logger.info(
            f"{f.stem}: {len(det['boxes'])} dets, "
            f"{det['latency_s'] * 1e3:.1f} ms"
        )
        with open(out_dir / f"{f.stem}.json", "w") as fh:
            json.dump(
                {
                    "boxes": det["boxes"].tolist(),
                    "scores": det["scores"].tolist(),
                    "labels": det["labels"].tolist(),
                },
                fh,
            )
        viz_utils.save_bev_png(
            cloud, det["boxes"], out_dir / f"{f.stem}.png",
            scores=det["scores"],
        )


if __name__ == "__main__":
    main()
