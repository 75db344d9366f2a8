"""SyncBN equivalence under GSPMD.

The reference optionally converts BN to SyncBatchNorm for DDP
(core/tools/train.py:118-119) because torch computes batch statistics
per process. In this framework the train step is ONE jitted program
over a jax.sharding.Mesh: a reduction over the (sharded) batch axis is
semantically global, so XLA inserts the cross-replica collective and
every BN layer is a SyncBN by construction. These tests pin that down:
running statistics produced on an 8-device mesh must equal the
single-device statistics on the same global batch — for plain
flax BatchNorm and for MaskedBatchNorm (whose masked count/mean/var
reductions must also be global)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.models.backbones_3d.spconv_backbone import MaskedBatchNorm
from de6d_tpu.parallel import make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    return make_mesh(8)


def _run(model, variables, args, mesh=None):
    def step(variables, *args):
        y, mut = model.apply(
            variables, *args, train=True, mutable=["batch_stats"]
        )
        return y, mut["batch_stats"]

    if mesh is None:
        return jax.jit(step)(variables, *args)
    with mesh:
        variables = replicate(variables, mesh)
        args = tuple(shard_batch(a, mesh) for a in args)
        return jax.jit(step)(variables, *args)


class _BNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )(x)


class _MaskedNet(nn.Module):
    @nn.compact
    def __call__(self, xm, train: bool = False):
        return MaskedBatchNorm()(xm["x"], xm["mask"], train)


def test_flax_bn_stats_global_over_mesh(mesh8):
    rng = np.random.RandomState(0)
    # per-sample distributions differ wildly so per-shard stats would
    # visibly diverge from global stats
    x = rng.normal(0, 1, (8, 64, 16)).astype(np.float32)
    x += np.arange(8, dtype=np.float32)[:, None, None] * 3.0
    model = _BNNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    y1, bs1 = _run(model, variables, (jnp.asarray(x),))
    y8, bs8 = _run(model, variables, (jnp.asarray(x),), mesh8)

    np.testing.assert_allclose(
        np.asarray(bs1["BatchNorm_0"]["mean"]),
        np.asarray(bs8["BatchNorm_0"]["mean"]), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bs1["BatchNorm_0"]["var"]),
        np.asarray(bs8["BatchNorm_0"]["var"]), rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y8), rtol=1e-4, atol=1e-4
    )


def test_masked_bn_stats_global_over_mesh(mesh8):
    rng = np.random.RandomState(1)
    x = rng.normal(0, 1, (8, 128, 8)).astype(np.float32)
    x += np.arange(8, dtype=np.float32)[:, None, None]
    mask = rng.rand(8, 128) > 0.3
    mask[0, :] = False  # one shard fully masked: its count must not
    # clip to 1 on-device (the clip happens on the GLOBAL count)
    batch = {"x": jnp.asarray(x), "mask": jnp.asarray(mask)}
    model = _MaskedNet()
    variables = model.init(jax.random.PRNGKey(0), batch)

    y1, bs1 = _run(model, variables, (batch,))
    y8, bs8 = _run(model, variables, (batch,), mesh8)

    k = "MaskedBatchNorm_0"
    np.testing.assert_allclose(
        np.asarray(bs1[k]["mean"]), np.asarray(bs8[k]["mean"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bs1[k]["var"]), np.asarray(bs8[k]["var"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y8), rtol=1e-4, atol=1e-4
    )
