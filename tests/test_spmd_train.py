"""SPMD train step over the virtual 8-device CPU mesh.

The reference tested its distributed path only by launching real DDP
jobs (SURVEY.md §4, §2.6); here the full Det6D train step (fwd + bwd +
optimizer under GSPMD) is exercised on 8 virtual CPU devices set up by
conftest.py. Matches reference DDP wrap core/tools/train.py:143-144.
"""

import jax
import numpy as np
import pytest

from de6d_tpu.parallel import make_mesh, replicate, shard_batch
from de6d_tpu.parallel.mesh import DATA_AXIS, data_sharding
from de6d_tpu.train import create_train_state, make_train_step
from de6d_tpu.train.optimization import build_optimizer_and_schedule
from de6d_tpu.models import build_network
from de6d_tpu.utils.testing import (
    det6d_synthetic_batch, tiny_det6d_cfg, tiny_det6d_spec,
)


OPT_CFG = {
    "OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
    "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
    "NUM_EPOCHS": 1, "GRAD_NORM_CLIP": 10.0,
}


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    return make_mesh(8)


def test_spmd_train_step_8dev(mesh8):
    """Full Det6D train step over the 8-device mesh: loss/grads finite,
    batch genuinely sharded one-shard-per-device, params replicated."""
    cfg = tiny_det6d_cfg()
    spec = tiny_det6d_spec()
    model = build_network(cfg, num_class=1, dataset=spec)
    rng = np.random.RandomState(0)
    batch = det6d_synthetic_batch(rng, spec, batch_size=8, n_points=256)
    # make per-sample content distinct so shards provably differ
    batch["points"][..., :3] += np.arange(8, dtype=np.float32)[
        :, None, None
    ] * 0.1

    with mesh8:
        sharded = shard_batch(dict(batch), mesh8)
        pts = sharded["points"]
        # one shard per device, each 1/8 of the global batch
        assert pts.sharding == data_sharding(mesh8)
        shards = pts.addressable_shards
        assert len(shards) == 8
        assert all(s.data.shape[0] == 1 for s in shards)
        shard_arrays = [np.asarray(s.data) for s in shards]
        for a, b in zip(shard_arrays, shard_arrays[1:]):
            assert not np.array_equal(a, b), "per-device shards identical"

        sample = {k: v[:2] for k, v in batch.items()}
        variables = model.init(jax.random.PRNGKey(0), dict(sample),
                               train=False)
        optimizer, _ = build_optimizer_and_schedule(
            OPT_CFG, variables["params"], steps_per_epoch=4
        )
        state = create_train_state(model, optimizer, sample)
        state = replicate(state, mesh8)
        train_step = make_train_step(model, optimizer)

        state, metrics = train_step(state, sharded)
        loss0 = float(metrics["loss"])
        gnorm = float(metrics["grad_norm"])
        assert np.isfinite(loss0), f"non-finite loss {loss0}"
        assert np.isfinite(gnorm) and gnorm > 0.0

        # params stay replicated (identical on every device)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        p_shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(p_shards) == 8
        for p in p_shards[1:]:
            np.testing.assert_array_equal(p_shards[0], p)

        # a second step keeps making progress (state donation works)
        state, metrics = train_step(state, shard_batch(dict(batch), mesh8))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 2


def test_spmd_matches_single_device():
    """The 8-way sharded step computes the same global loss as an
    unsharded run of the same global batch (GSPMD inserts the psum —
    the DDP-allreduce equivalence guarantee)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_det6d_cfg()
    spec = tiny_det6d_spec()
    model = build_network(cfg, num_class=1, dataset=spec)
    rng = np.random.RandomState(1)
    batch = det6d_synthetic_batch(rng, spec, batch_size=8, n_points=256)
    sample = {k: v[:2] for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), dict(sample), train=False)
    optimizer, _ = build_optimizer_and_schedule(
        OPT_CFG, variables["params"], steps_per_epoch=4
    )

    def one_loss(mesh):
        state = create_train_state(model, optimizer, sample)
        if mesh is not None:
            with mesh:
                state = replicate(state, mesh)
                step = make_train_step(model, optimizer)
                _, m = step(state, shard_batch(dict(batch), mesh))
                return float(m["loss"])
        step = make_train_step(model, optimizer)
        dev_batch = jax.tree_util.tree_map(jax.numpy.asarray, dict(batch))
        _, m = step(state, dev_batch)
        return float(m["loss"])

    loss_sharded = one_loss(make_mesh(8))
    loss_single = one_loss(None)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=2e-4)
