"""Training CLI.

Parity: reference core/tools/train.py — argparse → dataloader →
network → optimizer → train loop → post-training eval. DDP/NCCL init
is replaced by jax.distributed (multi-host) + a data-parallel mesh.

Usage:
  python -m de6d_tpu.tools.train --cfg_file configs/kitti_models/pointpillar.yaml
"""

from __future__ import annotations

import argparse
import datetime
from pathlib import Path

import jax
import numpy as np

from ..config import cfg, cfg_from_list, cfg_from_yaml_file
from ..datasets import build_dataloader
from ..models import build_network
from ..train import (
    build_optimizer_and_schedule, create_train_state, make_train_step,
)
from ..train.checkpoint import (
    latest_checkpoint, load_pretrained, restore_checkpoint,
)
from ..train.eval_utils import eval_one_epoch
from ..train.train_loop import train_model
from ..utils.common_utils import create_logger, set_random_seed


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument(
        "--profile", action="store_true",
        help="capture a jax.profiler trace of iterations 10-20 into "
             "<output_dir>/profile",
    )
    parser.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. 'cpu'); overrides ambient "
             "plugin registration",
    )
    parser.add_argument(
        "--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER
    )
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, _ = parse_config()
    if args.fix_random_seed:
        set_random_seed(666 + jax.process_index())

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = (
        Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    )
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / (
        "log_train_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    )
    logger = create_logger(log_file, rank=jax.process_index())
    logger.info(f"devices: {jax.devices()}")

    try:
        from tensorboardX import SummaryWriter

        tb_log = (
            SummaryWriter(str(output_dir / "tensorboard"))
            if jax.process_index() == 0 else None
        )
    except ImportError:
        tb_log = None

    train_set, train_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"),
        training=True, workers=args.workers, logger=logger,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=train_set
    )

    sample = next(iter(train_loader))
    from de6d_tpu.models import device_batch
    sample = device_batch(sample)

    optimizer, lr_schedule = None, None

    def build_opt(params):
        # the schedule horizon must follow the ACTUAL epoch count
        # (--epochs overrides cfg NUM_EPOCHS); otherwise OneCycle
        # anneals to ~0 after cfg-epochs and the rest of the run
        # trains at LR_CLIP
        opt_cfg = dict(cfg.OPTIMIZATION)
        opt_cfg["NUM_EPOCHS"] = epochs
        return build_optimizer_and_schedule(
            opt_cfg, params, steps_per_epoch=len(train_loader)
        )

    # jit the init: eager init dispatches thousands of individual ops
    # (and one compile per lax loop) — minutes through the TPU tunnel
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, train=False)
    )(jax.random.PRNGKey(0), dict(sample))
    optimizer, lr_schedule = build_opt(variables["params"])
    state = create_train_state(model, optimizer, sample)

    start_epoch = 0
    ckpt = args.ckpt or latest_checkpoint(ckpt_dir)
    if ckpt is not None:
        state, meta = restore_checkpoint(ckpt, state)
        start_epoch = int(meta.get("epoch", 0))
        logger.info(f"resumed from {ckpt} (epoch {start_epoch})")
    elif args.pretrained_model:
        # shape-matched partial warm-start (reference train.py
        # --pretrained_model → load_params_from_file, strict=False)
        state, _, _ = load_pretrained(
            args.pretrained_model, state, logger=logger
        )

    logger.info(
        f"start training {cfg.TAG} ({start_epoch}→{epochs} epochs, "
        f"{len(train_loader)} steps/epoch, global batch {batch_size})"
    )
    state = train_model(
        model, optimizer, state, train_loader, cfg.OPTIMIZATION,
        start_epoch=start_epoch, total_epochs=epochs,
        ckpt_dir=ckpt_dir, ckpt_save_interval=args.ckpt_save_interval,
        max_ckpt_save_num=args.max_ckpt_save_num,
        tb_log=tb_log, logger=logger, lr_schedule=lr_schedule,
        profile_dir=(output_dir / "profile") if args.profile else None,
    )

    # post-training eval (reference train.py:181-199)
    logger.info("training done, running evaluation")
    test_set, test_loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"),
        training=False, workers=args.workers, logger=logger,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    eval_dir = output_dir / "eval" / "eval_with_train"
    host_state = jax.tree_util.tree_map(np.asarray, state)
    eval_one_epoch(
        model, host_state.params, host_state.batch_stats, test_loader,
        test_set, cfg.MODEL, cfg.CLASS_NAMES,
        result_dir=eval_dir, logger=logger,
    )


if __name__ == "__main__":
    main()
