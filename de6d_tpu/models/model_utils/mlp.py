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
                # stats/normalize in fp32 under bf16: flax's
                # fast-variance (E[x²]−E[x]²) cancels catastrophically
                # in bf16 and stalled full-scale Det6D training (the
                # r4 bf16 stall; r5 bisect arm B localized it to the
                # SA/FP MLP stack — runs/train_det6d_bf16_armB_r5.log)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99,
                    epsilon=1e-3, dtype=jnp.float32,
                )(x)
            x = nn.relu(x).astype(self.dtype)
        return x

    def folded(self):
        """Eval-time per-layer affine weights ``[(W, b), ...]``.

        At inference BN is an affine map, so Dense(no bias) + BN folds
        into one fp32 (W·s, β − μ·s) pair with s = γ/√(σ²+ε). Fused
        consumers (ops.binned.binned_sa_infer) apply the MLP inside
        their center-chunk loop so the grouped tensor never
        materializes. Read-only: must not be called during init (the
        caller guards with ``is_initializing``); params/stats are read
        from this module's bound variables, matching the names the
        compact ``__call__`` created.
        """
        p = self.variables["params"]
        stats = self.variables.get("batch_stats", {})
        out = []
        for i in range(len(self.channels)):
            w = p[f"Dense_{i}"]["kernel"].astype(jnp.float32)
            if self.use_bn:
                bnp = p[f"BatchNorm_{i}"]
                st = stats[f"BatchNorm_{i}"]
                s = bnp["scale"].astype(jnp.float32) / jnp.sqrt(
                    st["var"].astype(jnp.float32) + 1e-3
                )
                b = bnp["bias"].astype(jnp.float32) - st["mean"].astype(
                    jnp.float32
                ) * s
                w = w * s[None, :]
            else:
                b = p[f"Dense_{i}"]["bias"].astype(jnp.float32)
            out.append((w, b))
        return out


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
                # fp32 BN under bf16 — see SharedMLP
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99,
                    epsilon=1e-3, dtype=jnp.float32,
                )(x)
            x = nn.relu(x).astype(self.dtype)
        return nn.Dense(self.output_channels)(x.astype(jnp.float32))
