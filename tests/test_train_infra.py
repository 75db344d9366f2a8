"""Training infra: optimizer schedules + checkpoint roundtrip.
(The SPMD train-step tests live in test_spmd_train.py.)"""

import jax
import jax.numpy as jnp
import numpy as np

from de6d_tpu.train.optimization import (
    build_optimizer_and_schedule, onecycle_momentum_schedule,
)


def test_onecycle_schedules():
    opt_cfg = {
        "OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
        "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
        "NUM_EPOCHS": 10, "GRAD_NORM_CLIP": 10.0,
    }
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    opt, lr_sched = build_optimizer_and_schedule(opt_cfg, params, 100)
    # warmup from lr/div to peak, then anneal
    assert float(lr_sched(0)) < 0.01 / 5
    peak_step = int(1000 * 0.4)
    assert float(lr_sched(peak_step)) > 0.009
    assert float(lr_sched(999)) < 1e-3
    moms = onecycle_momentum_schedule(1000, 0.4)
    assert abs(float(moms(0)) - 0.95) < 1e-6
    assert abs(float(moms(peak_step)) - 0.85) < 1e-2
    assert abs(float(moms(1000)) - 0.95) < 1e-2

    # weight decay mask: bias (1-D) excluded
    state = opt.init(params)
    grads = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    updates, _ = opt.update(grads, state, params)
    # with zero grads, only decay applies: w gets update, b stays 0
    assert float(jnp.abs(updates["w"]).sum()) > 0
    assert float(jnp.abs(updates["b"]).sum()) == 0


def test_cosine_warmup_schedule():
    """CosineWarmupLR shape (ref learning_schedules_fastai.py:84-94):
    cosine ramp LR/DIV → LR over WARMUP_EPOCH epochs, then the base
    decay-step schedule unchanged."""
    opt_cfg = {
        "OPTIMIZER": "adam", "LR": 0.01, "WEIGHT_DECAY": 0.01,
        "DECAY_STEP_LIST": [5, 8], "LR_DECAY": 0.1, "LR_CLIP": 1e-7,
        "NUM_EPOCHS": 10, "LR_WARMUP": True, "WARMUP_EPOCH": 2,
        "DIV_FACTOR": 10,
    }
    params = {"w": jnp.ones((4, 4))}
    _, lr_sched = build_optimizer_and_schedule(opt_cfg, params, 100)
    # step 0: eta_min = LR/DIV
    assert abs(float(lr_sched(0)) - 0.001) < 1e-8
    # midpoint of warmup: halfway up the cosine
    mid = float(lr_sched(100))
    assert abs(mid - (0.001 + (0.01 - 0.001) * 0.5)) < 1e-6
    # warmup is monotone increasing
    vals = [float(lr_sched(s)) for s in range(0, 200, 20)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    # after warmup: base schedule (plateau at LR until first decay)
    assert abs(float(lr_sched(300)) - 0.01) < 1e-8
    # decays apply at epoch boundaries 5 and 8
    assert abs(float(lr_sched(600)) - 0.001) < 1e-8
    assert abs(float(lr_sched(900)) - 0.0001) < 1e-9
    # no warmup flag → plain schedule from step 0
    opt_cfg2 = dict(opt_cfg, LR_WARMUP=False)
    _, lr2 = build_optimizer_and_schedule(opt_cfg2, params, 100)
    assert abs(float(lr2(0)) - 0.01) < 1e-8


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from de6d_tpu.train.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_checkpoint,
    )
    from de6d_tpu.train.train_state import TrainState

    params = {"w": np.arange(12, dtype=np.float32).reshape(3, 4)}
    opt = optax.adam(1e-3)
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={"bn": np.ones(4, np.float32)},
        opt_state=opt.init(params),
    )
    save_checkpoint(tmp_path, state, epoch=3)
    ckpt = latest_checkpoint(tmp_path)
    assert ckpt is not None and "epoch_3" in ckpt.name
    zero_state = jax.tree_util.tree_map(np.zeros_like, state)
    restored, meta = restore_checkpoint(ckpt, zero_state)
    assert int(meta["epoch"]) == 3
    np.testing.assert_array_equal(restored.params["w"], params["w"])
    assert int(restored.step) == 7


def test_checkpoint_pruning(tmp_path):
    import optax

    from de6d_tpu.train.checkpoint import list_checkpoints, save_checkpoint
    from de6d_tpu.train.train_state import TrainState

    params = {"w": np.ones(2, np.float32)}
    opt = optax.sgd(0.1)
    state = TrainState(
        step=jnp.asarray(0), params=params, batch_stats={},
        opt_state=opt.init(params),
    )
    for e in range(5):
        save_checkpoint(tmp_path, state, epoch=e, max_keep=3)
    kept = list_checkpoints(tmp_path)
    assert len(kept) == 3
    assert kept[-1].name == "checkpoint_epoch_4"


def test_load_pretrained_partial(tmp_path):
    """Shape-matched partial warm-start: matching name+shape tensors
    load, mismatched shapes and missing names stay fresh."""
    import optax

    from de6d_tpu.train.checkpoint import (
        load_pretrained, save_checkpoint,
    )
    from de6d_tpu.train.train_state import TrainState

    src_params = {
        "backbone": {"w": np.full((3, 4), 2.0, np.float32)},
        "head": {"w": np.full((5,), 3.0, np.float32)},
    }
    opt = optax.adam(1e-3)
    src = TrainState(
        step=jnp.asarray(9, jnp.int32),
        params=src_params,
        batch_stats={"bn": np.full(4, 7.0, np.float32)},
        opt_state=opt.init(src_params),
    )
    save_checkpoint(tmp_path, src, epoch=1)

    # destination: backbone matches, head has a DIFFERENT shape, and
    # there's a brand-new module the checkpoint has never seen
    dst_params = {
        "backbone": {"w": np.zeros((3, 4), np.float32)},
        "head": {"w": np.zeros((6,), np.float32)},
        "roi": {"w": np.zeros((2, 2), np.float32)},
    }
    dst = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=dst_params,
        batch_stats={"bn": np.zeros(4, np.float32)},
        opt_state=opt.init(dst_params),
    )
    out, n_loaded, n_skipped = load_pretrained(
        tmp_path / "checkpoint_epoch_1", dst
    )
    np.testing.assert_array_equal(
        out.params["backbone"]["w"], src_params["backbone"]["w"]
    )
    np.testing.assert_array_equal(out.params["head"]["w"], np.zeros(6))
    np.testing.assert_array_equal(out.params["roi"]["w"], np.zeros((2, 2)))
    np.testing.assert_array_equal(out.batch_stats["bn"], np.full(4, 7.0))
    assert n_loaded == 2  # backbone/w + bn
    assert n_skipped == 2  # head/w (shape), roi/w (missing)
    assert int(out.step) == 0  # step/opt_state untouched
