"""Train state + jitted SPMD train step.

Replaces the reference's train_one_epoch inner loop body
(core/tools/train_utils/train_utils.py:11-86: forward → backward →
clip → step, DDP allreduce implicit) with ONE jitted function over a
device mesh: the global batch arrives sharded on the 'data' axis,
grads/BN-stats reductions are inserted by GSPMD, the optimizer update
runs replicated. Donated arguments keep params/opt state in place in
HBM.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, optimizer, sample_batch, rng=None):
    """Init variables on the sample batch shapes and wrap in TrainState."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )(rng, dict(sample_batch))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def make_train_step(model, optimizer):
    """Returns jitted train_step(state, batch) -> (state, metrics)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, mutated = model.apply(
                    variables, dict(batch), train=True,
                    mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                out = model.apply(variables, dict(batch), train=True)
                new_stats = state.batch_stats
            loss, tb = model.get_training_loss(out)
            return loss, (tb, new_stats)

        (loss, (tb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(tb)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, post_cfg, num_class: int):
    """Jitted inference step: forward + NMS post-processing."""
    from ..models.detectors.detector3d_template import post_processing

    @jax.jit
    def eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, dict(batch), train=False)
        return post_processing(out, post_cfg, num_class)

    return eval_step
