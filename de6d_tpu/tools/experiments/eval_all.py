"""Sweep evaluation: all models × all slope-variant datasets.

Parity: reference tools/experiments/eval_all.py (:37) +
collect_eval_result_from_logs.py (:196) — but results are collected
into one JSON instead of scraped from logs.

Usage:
  python -m de6d_tpu.tools.experiments.eval_all \
      --cfg_dir configs/slopedkitti_models --ckpt_root output \
      --out sweep_results.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_dir", required=True)
    ap.add_argument("--ckpt_root", default="output")
    ap.add_argument("--data_paths", nargs="*", default=None,
                    help="override DATA_PATH per run (slope variants)")
    ap.add_argument("--out", default="sweep_results.json")
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    import jax

    from ...config import Config, cfg_from_yaml_file
    from ...datasets import build_dataloader
    from ...models import build_network
    from ...train import build_optimizer_and_schedule, create_train_state
    from ...train.checkpoint import latest_checkpoint, restore_checkpoint
    from ...train.eval_utils import eval_one_epoch
    from ...utils.common_utils import create_logger

    logger = create_logger()
    results = {}
    for cfg_file in sorted(Path(args.cfg_dir).glob("*.yaml")):
        cfg = cfg_from_yaml_file(str(cfg_file), Config())
        data_paths = args.data_paths or [cfg.DATA_CONFIG.get("DATA_PATH")]
        for data_path in data_paths:
            tag = f"{cfg.TAG}@{Path(data_path).name}"
            logger.info(f"=== {tag} ===")
            try:
                test_set, test_loader = build_dataloader(
                    cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size,
                    root_path=data_path, training=False, logger=logger,
                )
                model = build_network(
                    cfg.MODEL, len(cfg.CLASS_NAMES), test_set
                )
                sample = test_set.collate_batch(
                    [test_set.getitem_prepared(0)]
                )
                keys = ("points", "points_mask", "gt_boxes")
                sample = {k: sample[k] for k in keys if k in sample}
                variables = model.init(
                    jax.random.PRNGKey(0), dict(sample), train=False
                )
                optimizer, _ = build_optimizer_and_schedule(
                    cfg.OPTIMIZATION, variables["params"], 1
                )
                state = create_train_state(model, optimizer, sample)
                ckpt_dir = (
                    Path(args.ckpt_root) / cfg.EXP_GROUP_PATH / cfg.TAG
                    / "default" / "ckpt"
                )
                ckpt = latest_checkpoint(ckpt_dir)
                if ckpt is None:
                    logger.warning(f"no checkpoint for {cfg.TAG}")
                    continue
                state, _ = restore_checkpoint(ckpt, state)
                import numpy as np

                host = jax.tree_util.tree_map(np.asarray, state)
                ret, _ = eval_one_epoch(
                    model, host.params, host.batch_stats, test_loader,
                    test_set, cfg.MODEL, cfg.CLASS_NAMES, logger=logger,
                )
                results[tag] = {
                    k: float(v) for k, v in ret.items()
                    if isinstance(v, (int, float))
                }
            except Exception as e:  # keep sweeping
                logger.warning(f"{tag} failed: {e}")
                results[tag] = {"error": str(e)}
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    logger.info(f"wrote {args.out}")


if __name__ == "__main__":
    main()
