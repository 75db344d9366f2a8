"""Regression: BatchNorm inside bf16 SharedMLP/FCStack must compute
batch statistics in fp32.

flax's fast-variance (E[x²] − E[x]²) cancels catastrophically in bf16:
for features with mean ~8 and std 0.5, E[x²] ≈ 64.25 rounds to a
0.5-spaced bf16 grid, so the variance estimate lands on {0, 0.5}
instead of 0.25. This is the dtype boundary that stalled full-scale
Det6D bf16 training (r4; r5 bisect arm B localized it to the SA/FP
MLP stack — runs/train_det6d_bf16_armB_r5.log vs armH healthy)."""

import jax
import jax.numpy as jnp
import numpy as np

from de6d_tpu.models.model_utils.mlp import SharedMLP


def _batch_var_through(mlp_dtype, x):
    c = x.shape[-1]
    mlp = SharedMLP((c,), use_bn=True, dtype=mlp_dtype)
    variables = mlp.init(jax.random.PRNGKey(0), x, train=True)
    # identity Dense so the BN sees exactly x (bf16-rounded)
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    params["Dense_0"]["kernel"] = jnp.eye(c, dtype=jnp.float32)
    _, updated = mlp.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x, train=True, mutable=["batch_stats"],
    )
    ra_var = np.asarray(
        updated["batch_stats"]["BatchNorm_0"]["var"], np.float64
    )
    # ra = 0.99·1 + 0.01·batch_var  →  batch_var = (ra − 0.99)/0.01
    return (ra_var - 0.99) / 0.01


def test_bf16_bn_variance_is_fp32_exact(rng):
    c, n = 8, 4096
    x = (8.0 + 0.5 * rng.randn(n, c)).astype(np.float32)
    x_bf = np.asarray(
        jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)
    )
    true_var = np.var(x_bf, axis=0)

    est = _batch_var_through(jnp.bfloat16, jnp.asarray(x))
    # bf16 fast-variance lands on {0, 0.5}; fp32 stats track the truth
    np.testing.assert_allclose(est, true_var, rtol=0.05, atol=0.01)
