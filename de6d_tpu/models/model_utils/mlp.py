"""Shared MLP building blocks (Dense + BN + ReLU stacks over the last
axis). The reference's Conv1d/Conv2d 1×1 stacks are plain per-point
GEMMs — on TPU we express them as Dense so XLA tiles them onto the MXU
with the point dim as the batch."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SharedMLP(nn.Module):
    """dtype: compute dtype (MODEL.COMPUTE_DTYPE plumbing — bf16 MXU
    matmuls with fp32 params; see model_utils.dtype_utils). Output stays
    in the compute dtype (it is a feature, not a prediction)."""

    channels: tuple
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for c in self.channels:
            x = nn.Dense(
                int(c), use_bias=not self.use_bn, dtype=self.dtype
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99,
                    epsilon=1e-3, dtype=self.dtype,
                )(x)
            x = nn.relu(x)
        return x


class FCStack(nn.Module):
    """fc_list of Dense+BN+ReLU, then a final biased Dense to
    output_channels (reference make_fc_layers,
    point_head_box6d_vote.py:157-170).

    dtype: compute dtype for the hidden stack. The final (prediction)
    Dense always emits fp32 — raw predictions feed decode/NMS/losses,
    which stay fp32 (dtype_utils contract)."""

    fc_list: tuple
    output_channels: int
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for c in self.fc_list:
            x = nn.Dense(
                int(c), use_bias=not self.use_bn, dtype=self.dtype
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99,
                    epsilon=1e-3, dtype=self.dtype,
                )(x)
            x = nn.relu(x)
        return nn.Dense(self.output_channels)(x.astype(jnp.float32))
