"""Optimizers + LR schedules (optax).

Parity: reference train_utils/optimization/__init__.py:11-63 —
'adam' / 'sgd' / 'adam_onecycle' (fastai OptimWrapper with OneCycle
cosine phases, learning_schedules_fastai.py). The fastai machinery
(layer groups, BN-group weight-decay exclusion, per-group moms)
becomes an optax chain:

- OneCycle: optax.cosine_onecycle_schedule (same cos-anneal phases,
  div_factor warmup, PCT_START split).
- "true weight decay" with BN/bias exclusion: optax.add_decayed_weights
  with a mask over 1-D params.
- momentum scheduling (MOMS [0.95, 0.85]): adam b1 follows the
  inverse-onecycle cosine, via a custom schedule wired into
  scale_by_adam through inject_hyperparams.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def onecycle_momentum_schedule(total_steps: int, pct_start: float,
                               moms=(0.95, 0.85)):
    """Momentum anneals opposite to LR: m0 → m1 over warmup, back to
    m0 over cooldown (fastai OneCycle.moms)."""
    hi, lo = moms
    warm = max(int(total_steps * pct_start), 1)

    def sched(step):
        step = jnp.minimum(step, total_steps)
        in_warm = step < warm
        t1 = jnp.clip(step / warm, 0.0, 1.0)
        t2 = jnp.clip((step - warm) / max(total_steps - warm, 1), 0.0, 1.0)
        cos1 = hi + (lo - hi) * 0.5 * (1 - jnp.cos(jnp.pi * t1))
        cos2 = lo + (hi - lo) * 0.5 * (1 - jnp.cos(jnp.pi * t2))
        return jnp.where(in_warm, cos1, cos2)

    return sched


def _maybe_warmup(base_sched, opt_cfg, lr: float, steps_per_epoch: int):
    """CosineWarmupLR (reference learning_schedules_fastai.py:84-94,
    wired at optimization/__init__.py:57-61): when LR_WARMUP is set on
    a non-onecycle optimizer, the first WARMUP_EPOCH epochs ramp the LR
    along a cosine from eta_min = LR/DIV_FACTOR up to the base
    schedule's value; after the warmup window the base schedule takes
    over unchanged."""
    if not opt_cfg.get("LR_WARMUP", False):
        return base_sched
    warmup_steps = max(int(opt_cfg.get("WARMUP_EPOCH", 1)) * steps_per_epoch, 1)
    eta_min = lr / float(opt_cfg.get("DIV_FACTOR", 10.0))

    def sched(step):
        t = jnp.clip(step / warmup_steps, 0.0, 1.0)
        warm = eta_min + (base_sched(step) - eta_min) * 0.5 * (1 - jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, base_sched(step))

    return sched


def _decay_mask(params):
    """True for params that receive weight decay: exclude biases and
    all 1-D params (BN scale/bias) — the fastai wrapper's BN-group
    separation (fastai_optim.py)."""
    import jax

    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def build_optimizer_and_schedule(opt_cfg, params, steps_per_epoch: int):
    """Returns (optax.GradientTransformation, lr_schedule_fn)."""
    total_steps = int(steps_per_epoch * opt_cfg["NUM_EPOCHS"])
    lr = float(opt_cfg["LR"])
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))
    name = str(opt_cfg.get("OPTIMIZER", "adam_onecycle"))

    if name == "adam_onecycle":
        pct_start = float(opt_cfg.get("PCT_START", 0.4))
        div = float(opt_cfg.get("DIV_FACTOR", 10.0))
        lr_sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=lr,
            pct_start=pct_start,
            div_factor=div,
            final_div_factor=div * 1e4 / div,  # lr/1e4 floor like fastai
        )
        mom_sched = onecycle_momentum_schedule(
            total_steps, pct_start, tuple(opt_cfg.get("MOMS", [0.95, 0.85]))
        )
        opt = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.chain(
                optax.scale_by_adam(b1=b1),
                optax.add_decayed_weights(wd, mask=_decay_mask(params)),
                optax.scale_by_learning_rate(learning_rate),
            )
        )(learning_rate=lr_sched, b1=mom_sched)
    elif name == "adam":
        decay_steps = [int(e * steps_per_epoch) for e in opt_cfg.get("DECAY_STEP_LIST", [])]
        gamma = float(opt_cfg.get("LR_DECAY", 0.1))
        lr_clip = float(opt_cfg.get("LR_CLIP", 1e-7))

        def lr_sched(step):
            f = 1.0
            for d in decay_steps:
                f = jnp.where(step >= d, f * gamma, f)
            return jnp.maximum(lr * f, lr_clip)

        lr_sched = _maybe_warmup(lr_sched, opt_cfg, lr, steps_per_epoch)
        opt = optax.adamw(lr_sched, weight_decay=wd, mask=_decay_mask(params))
    elif name == "sgd":
        lr_sched = _maybe_warmup(lambda step: jnp.asarray(lr), opt_cfg, lr,
                                 steps_per_epoch)
        opt = optax.chain(
            optax.sgd(lr_sched, momentum=float(opt_cfg.get("MOMENTUM", 0.9))),
            optax.add_decayed_weights(wd, mask=_decay_mask(params)),
        )
    else:
        raise NotImplementedError(name)

    if clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt, lr_sched
