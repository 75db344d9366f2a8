"""Shared MLP building blocks (Dense + BN + ReLU stacks over the last
axis). The reference's Conv1d/Conv2d 1×1 stacks are plain per-point
GEMMs — on TPU we express them as Dense so XLA tiles them onto the MXU
with the point dim as the batch."""

from __future__ import annotations

import flax.linen as nn


class SharedMLP(nn.Module):
    channels: tuple
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for c in self.channels:
            x = nn.Dense(int(c), use_bias=not self.use_bn)(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3
                )(x)
            x = nn.relu(x)
        return x


class FCStack(nn.Module):
    """fc_list of Dense+BN+ReLU, then a final biased Dense to
    output_channels (reference make_fc_layers,
    point_head_box6d_vote.py:157-170)."""

    fc_list: tuple
    output_channels: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for c in self.fc_list:
            x = nn.Dense(int(c), use_bias=not self.use_bn)(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3
                )(x)
            x = nn.relu(x)
        return nn.Dense(self.output_channels)(x)
