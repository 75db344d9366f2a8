"""Frustum feature network (depth-distribution FFN) + DDN loss.

Parity: reference DepthFFN
(.../image_vfe_modules/ffn/depth_ffn.py: ddn → channel_reduce →
frustum plane-sweep volume) and DDNLoss + Balancer
(.../ffn/ddn_loss/{ddn_loss,balancer}.py): focal cross-entropy over
depth bins with fixed foreground/background pixel balancing from 2D
boxes.

TPU-first: frustum features are (B, D, H, W, C) channels-last; the
loss is a pure function (flax modules don't stash forward dicts — the
detector reads `depth_logits` back out of batch_dict).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .....utils import transform_utils
from .ddn import DDNDeepLabV3


class BasicBlock2D(nn.Module):
    """Conv + BN + ReLU (reference model_utils/basic_block_2d.py)."""

    out_channels: int
    kernel_size: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel_size
        pad = k // 2
        x = nn.Conv(
            self.out_channels, (k, k), padding=((pad, pad), (pad, pad)),
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class DepthFFN(nn.Module):
    """images → layer1 features ⊗ softmax depth distribution →
    frustum features (B, D, H/4, W/4, C)."""

    model_cfg: dict
    downsample_factor: int
    dtype: object = jnp.float32

    @property
    def disc_cfg(self):
        return dict(self.model_cfg["DISCRETIZE"])

    @property
    def out_channels(self):
        return int(self.model_cfg["CHANNEL_REDUCE"]["out_channels"])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        disc = self.disc_cfg
        ddn_cfg = self.model_cfg["DDN"]
        ddn = DDNDeepLabV3(
            num_classes=int(disc["num_bins"]) + 1,
            backbone_name=str(ddn_cfg.get("BACKBONE_NAME", "ResNet50")),
            feat_extract_layer=str(
                ddn_cfg.get("ARGS", {}).get(
                    "feat_extract_layer", "layer1"
                )
            ),
            dtype=self.dtype,
        )
        result = ddn(batch_dict["images"], train=train)
        image_features = result["features"]  # (B, h, w, 256)
        depth_logits = result["logits"]  # (B, h, w, D+1)

        reduce_cfg = self.model_cfg["CHANNEL_REDUCE"]
        image_features = BasicBlock2D(
            out_channels=int(reduce_cfg["out_channels"]),
            kernel_size=int(reduce_cfg.get("kernel_size", 1)),
            dtype=self.dtype,
        )(image_features, train)

        frustum = create_frustum_features(image_features, depth_logits)
        batch_dict["frustum_features"] = frustum
        batch_dict["depth_logits"] = depth_logits
        return batch_dict


def create_frustum_features(image_features, depth_logits):
    """Plane-sweep outer product (reference depth_ffn.py:71-93).

    image_features: (B, h, w, C); depth_logits: (B, h, w, D+1) →
    (B, D, h, w, C): softmax over depth, drop the overflow bin,
    multiply into the image features.
    """
    probs = jax.nn.softmax(depth_logits, axis=-1)[..., :-1]  # (B,h,w,D)
    # (B, D, h, w, 1) * (B, 1, h, w, C)
    probs = jnp.moveaxis(probs, -1, 1)[..., None]
    feats = image_features[:, None]
    return probs * feats


def compute_fg_mask(gt_boxes2d, shape, downsample_factor=1):
    """(B, N, 4) [u1, v1, u2, v2] boxes → (B, H, W) bool foreground
    mask (reference loss_utils.compute_fg_mask:264-290, vectorized —
    the reference's python double loop becomes a broadcast reduce).
    Zero-area boxes (padding rows) contribute nothing."""
    b, h, w = shape
    boxes = gt_boxes2d / downsample_factor
    u1 = jnp.floor(boxes[..., 0])[:, :, None, None]
    v1 = jnp.floor(boxes[..., 1])[:, :, None, None]
    u2 = jnp.ceil(boxes[..., 2])[:, :, None, None]
    v2 = jnp.ceil(boxes[..., 3])[:, :, None, None]
    uu = jnp.arange(w, dtype=boxes.dtype)[None, None, None, :]
    vv = jnp.arange(h, dtype=boxes.dtype)[None, None, :, None]
    inside = (uu >= u1) & (uu < u2) & (vv >= v1) & (vv < v2)
    return jnp.any(inside, axis=1)


def ddn_loss(depth_logits, depth_maps, gt_boxes2d, disc_cfg,
             downsample_factor, weight=3.0, alpha=0.25, gamma=2.0,
             fg_weight=13.0, bg_weight=1.0):
    """Focal CE over depth bins + fg/bg balancing (reference
    DDNLoss/Balancer). depth_logits: (B, h, w, D+1); depth_maps:
    (B, h, w) metres; gt_boxes2d: (B, N, 4) in feature pixels*ds."""
    num_bins = int(disc_cfg["num_bins"])
    target = transform_utils.bin_depths(
        depth_maps, mode=disc_cfg["mode"],
        depth_min=float(disc_cfg["depth_min"]),
        depth_max=float(disc_cfg["depth_max"]),
        num_bins=num_bins, target=True,
    )  # (B, h, w) int in [0, num_bins]

    logp = jax.nn.log_softmax(depth_logits, axis=-1)
    onehot = jax.nn.one_hot(target, num_bins + 1, dtype=logp.dtype)
    pt_log = jnp.sum(onehot * logp, axis=-1)
    pt = jnp.exp(pt_log)
    focal = -alpha * (1.0 - pt) ** gamma * pt_log  # (B, h, w)

    fg = compute_fg_mask(
        gt_boxes2d, focal.shape, downsample_factor
    )
    bg = ~fg
    num_pixels = focal.size
    weights = fg_weight * fg + bg_weight * bg
    weighted = focal * weights
    fg_loss = jnp.sum(jnp.where(fg, weighted, 0.0)) / num_pixels
    bg_loss = jnp.sum(jnp.where(bg, weighted, 0.0)) / num_pixels
    loss = (fg_loss + bg_loss) * weight
    tb = {
        "ddn_loss": loss,
        "ddn_fg_loss": fg_loss,
        "ddn_bg_loss": bg_loss,
    }
    return loss, tb
