"""Depth distribution network — DeepLabV3 (ResNet + ASPP) in flax.

Parity: reference DDNDeepLabV3 / DDNTemplate
(core/pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn/
ddn_deeplabv3.py, ddn_template.py): a torchvision
deeplabv3_resnet{50,101} with
- features extracted from `layer1` (stride 4, 256 ch),
- classifier logits (ASPP head over the dilated stride-8 layer4)
  bilinearly resized to the layer1 feature shape.

TPU-first: NHWC layout, bf16-able convs (fp32 params), jax.image
bilinear resize (half-pixel centers = torch align_corners=False).
Pretrained torchvision weights are not downloadable in this
environment; shapes are weight-compatible (same convs/strides/
dilations) so a converted checkpoint can be loaded via the partial
checkpoint loader.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(y):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype,
            )(y)

        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(bn(y))
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=((self.dilation, self.dilation),) * 2,
            use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.relu(bn(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = bn(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype,
            )(x)
            residual = bn(residual)
        return nn.relu(y + residual)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (torchvision rates 12/24/36)."""

    channels: int = 256
    rates: tuple = (12, 24, 36)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        def bn_relu(y):
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype,
            )(y)
            return nn.relu(y)

        branches = [
            bn_relu(nn.Conv(self.channels, (1, 1), use_bias=False,
                            dtype=self.dtype)(x))
        ]
        for r in self.rates:
            branches.append(bn_relu(nn.Conv(
                self.channels, (3, 3), kernel_dilation=(r, r),
                padding=((r, r), (r, r)), use_bias=False,
                dtype=self.dtype,
            )(x)))
        # global-average-pool branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = bn_relu(nn.Conv(self.channels, (1, 1), use_bias=False,
                            dtype=self.dtype)(g))
        g = jnp.broadcast_to(
            g, x.shape[:3] + (self.channels,)
        )
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = bn_relu(nn.Conv(self.channels, (1, 1), use_bias=False,
                            dtype=self.dtype)(y))
        return y


_LAYERS = {"ResNet50": (3, 4, 6, 3), "ResNet101": (3, 4, 23, 3)}


class DDNDeepLabV3(nn.Module):
    """ResNet-D backbone (output stride 8, dilated layer3/4) + ASPP
    classifier; returns layer1 features + depth-bin logits resized to
    the feature shape."""

    num_classes: int  # num depth bins + 1 overflow bin
    backbone_name: str = "ResNet50"
    feat_extract_layer: str = "layer1"
    normalize_input: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, H, W, 3) in [0, 1] (NaN = padding) →
        dict(features (B, H/4, W/4, 256), logits (B, H/4, W/4, C))."""
        x = images
        if self.normalize_input:
            nan = jnp.isnan(x)
            x = jnp.where(nan, 0.0, x)
            x = (x - jnp.asarray(_IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                _IMAGENET_STD, x.dtype
            )
            x = jnp.where(nan, 0.0, x)

        x = x.astype(self.dtype)
        layers = _LAYERS[self.backbone_name]
        # stem
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        stage_specs = [
            ("layer1", 64, 1, 1),
            ("layer2", 128, 2, 1),
            ("layer3", 256, 1, 2),   # stride replaced by dilation
            ("layer4", 512, 1, 4),
        ]
        for (name, planes, stride, dilation), blocks in zip(
            stage_specs, layers
        ):
            for b in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    dilation=dilation,
                    downsample=(b == 0),
                    dtype=self.dtype,
                )(x, train)
            feats[name] = x

        features = feats[self.feat_extract_layer]
        y = ASPP(dtype=self.dtype)(feats["layer4"], train)
        y = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(y)
        logits = jax.image.resize(
            logits.astype(jnp.float32),
            logits.shape[:1] + features.shape[1:3]
            + (self.num_classes,),
            method="bilinear",
        )
        return {
            "features": features.astype(jnp.float32),
            "logits": logits,
        }
