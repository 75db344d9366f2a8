"""OccAM attribution CLI (reference tools/experiments/occam_analysis.py
:91): load a config + checkpoint, attribute one point cloud, save the
per-detection per-property maps as npz.

Usage:
  python -m de6d_tpu.tools.experiments.occam_analysis \
      --cfg_file configs/kitti_models/pointpillar.yaml \
      --ckpt output/.../ckpt/checkpoint_epoch_80 \
      --source_file_path frame.bin --nr_it 3000 --out occam.npz \
      [--platform cpu]
"""

from __future__ import annotations

import argparse

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--source_file_path", required=True)
    ap.add_argument("--nr_it", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default="occam_attr.npz")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from de6d_tpu.config import cfg, cfg_from_yaml_file
    from de6d_tpu.datasets import build_dataloader
    from de6d_tpu.models import build_network
    from de6d_tpu.train.checkpoint import restore_checkpoint
    from de6d_tpu.train.train_state import create_train_state
    from de6d_tpu.utils.analysis.occam import OccamAnalyzer

    cfg_from_yaml_file(args.cfg_file, cfg)
    test_set, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"), training=False,
        workers=0,
    )
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set
    )
    pts = np.fromfile(args.source_file_path, np.float32).reshape(-1, 4)
    max_pts = int(pts.shape[0])
    import jax.numpy as jnp

    sample = {
        "points": jnp.asarray(pts[None]),
        "points_mask": jnp.ones((1, max_pts), bool),
    }
    import optax

    state = create_train_state(model, optax.sgd(0.0), sample)
    state, _ = restore_checkpoint(args.ckpt, state)
    variables = {
        "params": state.params, "batch_stats": state.batch_stats
    }

    analyzer = OccamAnalyzer(
        model, variables, cfg.MODEL, len(cfg.CLASS_NAMES),
        batch_size=args.batch_size,
    )
    dets, attr, smap = analyzer.attribute(pts, args.nr_it)
    np.savez(
        args.out, boxes=dets["boxes"], labels=dets["labels"],
        scores=dets["scores"], channels=np.array(dets["channels"]),
        attribution=attr, sampling_map=smap,
    )
    print(f"{len(dets['boxes'])} detections → {args.out}")


if __name__ == "__main__":
    main()
