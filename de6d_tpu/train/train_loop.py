"""Training loop.

Parity: reference tools/train_utils/train_utils.py train_one_epoch /
train_model (:11-135): per-iter LR scheduling (inside the optax
schedule), grad clipping (inside the optax chain), timing meters,
tqdm, TB scalars, periodic checkpoints. The forward+backward+update is
ONE jitted SPMD step; host work per iter is only the input pipeline.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ..parallel import make_mesh, shard_batch
from ..parallel.collectives import average_reduce_value
from ..utils.common_utils import AverageMeter
from .checkpoint import save_checkpoint
from .train_state import make_train_step


def train_model(
    model,
    optimizer,
    state,
    train_loader,
    opt_cfg,
    start_epoch: int = 0,
    total_epochs: int = 80,
    ckpt_dir=None,
    ckpt_save_interval: int = 1,
    max_ckpt_save_num: int = 30,
    tb_log=None,
    logger=None,
    lr_schedule=None,
    mesh=None,
    log_interval: int = 50,
    profile_dir=None,
    profile_steps: tuple = (10, 20),
):
    """``profile_dir``: if set, capture a ``jax.profiler`` trace over
    iterations [profile_steps[0], profile_steps[1]) into that dir
    (SURVEY §5.1 — replaces the reference's ad-hoc cuda-sync timers)."""
    mesh = mesh or make_mesh()
    train_step = make_train_step(model, optimizer)
    data_time = AverageMeter()
    step_time = AverageMeter()
    step_window = []  # last-50 steady-state window

    from ..models import device_batch as _device_batch
    it = int(state.step)
    profiling = False
    prev_loss = None  # 1-deep pipeline: device runs step k while the
    # host preps batch k+1; we only block on step k-1's metrics, so
    # host data time and device step time overlap instead of adding.
    with mesh:
        for epoch in range(start_epoch, total_epochs):
            train_loader.set_epoch(epoch)
            t_end = time.perf_counter()
            for batch in train_loader:
                if profile_dir is not None and it == profile_steps[0]:
                    jax.profiler.start_trace(str(profile_dir))
                    profiling = True
                t_data = time.perf_counter() - t_end
                dev_batch = shard_batch(_device_batch(batch), mesh)
                state, metrics = train_step(state, dev_batch)
                if prev_loss is not None:
                    prev_loss.block_until_ready()
                prev_loss = metrics["loss"]
                t_step = time.perf_counter() - t_end - t_data
                data_time.update(t_data)
                step_time.update(t_step)
                it += 1
                if profiling and it >= profile_steps[1]:
                    jax.profiler.stop_trace()
                    profiling = False
                    if logger:
                        logger.info(f"profiler trace saved to {profile_dir}")
                if tb_log is not None and it % log_interval == 0:
                    for k, v in metrics.items():
                        tb_log.add_scalar(f"train/{k}", float(v), it)
                    if lr_schedule is not None:
                        tb_log.add_scalar(
                            "meta_data/learning_rate",
                            float(lr_schedule(it)), it,
                        )
                step_window.append(t_step)
                if len(step_window) > 50:
                    step_window.pop(0)
                if logger is not None and it % log_interval == 0:
                    # cross-process mean of host timings (reference
                    # train_utils.py:60-62 average_reduce_value)
                    avg_data = average_reduce_value(data_time.avg)
                    avg_step = average_reduce_value(step_time.avg)
                    # cumulative avg amortizes the compile step; the
                    # 50-iter window is the steady-state number
                    w50 = sum(step_window) / len(step_window)
                    logger.info(
                        f"epoch {epoch} it {it} "
                        f"loss {float(metrics['loss']):.4f} "
                        f"data {avg_data * 1e3:.0f}ms "
                        f"step {avg_step * 1e3:.0f}ms "
                        f"step50 {w50 * 1e3:.0f}ms"
                    )
                t_end = time.perf_counter()

            if (
                ckpt_dir is not None
                and jax.process_index() == 0
                and (epoch + 1) % ckpt_save_interval == 0
            ):
                host_state = jax.tree_util.tree_map(np.asarray, state)
                save_checkpoint(
                    ckpt_dir, host_state, epoch + 1, max_ckpt_save_num
                )
                if logger:
                    logger.info(f"saved checkpoint epoch {epoch + 1}")
        if profiling:
            jax.profiler.stop_trace()
    return state
