"""2D BEV backbone.

Parity: reference BaseBEVBackbone
(backbones_2d/base_bev_backbone.py:112): N downsampling blocks of
(stride-S conv + [conv]×L), each followed by a transposed-conv
upsample, multi-scale concat. NHWC layout; convs are 3×3 so they map
straight onto the MXU as implicit GEMMs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONES_2D
from ..model_utils.dtype_utils import compute_dtype


class ConvBlock(nn.Module):
    channels: int
    stride: int
    num_layers: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.channels, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        for _ in range(self.num_layers):
            x = nn.Conv(
                self.channels, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x


@BACKBONES_2D.register
class BaseBEVBackbone(nn.Module):
    model_cfg: dict
    input_channels: int

    @property
    def num_bev_features(self):
        ups = self.model_cfg.get("NUM_UPSAMPLE_FILTERS", [])
        if ups:
            n = sum(int(u) for u in ups)
            if len(ups) > len(self.model_cfg.get("LAYER_NUMS", [])):
                # extra final upsample layer halves nothing; channel = last
                pass
            return n
        return int(self.model_cfg["NUM_FILTERS"][-1])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        dt = compute_dtype(self.model_cfg)
        x = batch_dict["spatial_features"].astype(dt)  # (B, ny, nx, C)
        layer_nums = list(self.model_cfg.get("LAYER_NUMS", []))
        strides = list(self.model_cfg.get("LAYER_STRIDES", []))
        filters = list(self.model_cfg.get("NUM_FILTERS", []))
        up_strides = list(self.model_cfg.get("UPSAMPLE_STRIDES", []))
        up_filters = list(self.model_cfg.get("NUM_UPSAMPLE_FILTERS", []))

        ups = []
        for i in range(len(layer_nums)):
            x = ConvBlock(
                filters[i], strides[i], layer_nums[i], dtype=dt
            )(x, train)
            if i < len(up_strides):
                s = up_strides[i]
                if s >= 1:
                    u = nn.ConvTranspose(
                        up_filters[i], (int(s), int(s)),
                        strides=(int(s), int(s)), use_bias=False, dtype=dt,
                    )(x)
                else:  # fractional stride = strided conv downsample
                    inv = int(round(1 / s))
                    u = nn.Conv(
                        up_filters[i], (inv, inv), strides=(inv, inv),
                        use_bias=False, dtype=dt,
                    )(x)
                u = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99,
                    epsilon=1e-3, dtype=dt,
                )(u)
                ups.append(nn.relu(u))
            else:
                ups.append(x)

        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        # optional extra deconv on the concat (reference supports
        # len(UPSAMPLE_STRIDES) == len(LAYER_NUMS)+1)
        if len(up_strides) > len(layer_nums):
            s = int(up_strides[-1])
            x = nn.ConvTranspose(
                up_filters[-1], (s, s), strides=(s, s), use_bias=False,
                dtype=dt,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=dt,
            )(x)
            x = nn.relu(x)
        batch_dict["spatial_features_2d"] = x
        return batch_dict
