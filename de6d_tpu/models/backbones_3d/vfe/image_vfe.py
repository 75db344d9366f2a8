"""ImageVFE — camera-only voxel features for CaDDN.

Parity: reference ImageVFE
(core/pcdet/models/backbones_3d/vfe/image_vfe.py:85): ffn (DepthFFN)
→ f2v (FrustumToVoxel). The DDN loss is exposed as a pure function
(`image_vfe_loss`) over batch_dict instead of a stateful get_loss —
flax modules don't keep forward dicts.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ....registry import VFE
from ...model_utils.dtype_utils import compute_dtype
from .image_vfe_modules.f2v import frustum_to_voxel
from .image_vfe_modules.ffn import DepthFFN, ddn_loss


@VFE.register
class ImageVFE(nn.Module):
    model_cfg: dict
    num_point_features: int = 0
    grid_size: tuple = (0, 0, 0)  # (X, Y, Z)
    point_cloud_range: tuple = ()
    depth_downsample_factor: int = 4

    @property
    def output_feature_dim(self):
        return int(self.model_cfg["FFN"]["CHANNEL_REDUCE"]["out_channels"])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        dt = compute_dtype(self.model_cfg)
        ffn = DepthFFN(
            model_cfg=self.model_cfg["FFN"],
            downsample_factor=self.depth_downsample_factor,
            dtype=dt,
        )
        batch_dict = ffn(batch_dict, train=train)
        batch_dict = frustum_to_voxel(
            batch_dict,
            grid_size=self.grid_size,
            pc_range=self.point_cloud_range,
            disc_cfg=dict(self.model_cfg["FFN"]["DISCRETIZE"]),
        )
        batch_dict["voxel_features"] = batch_dict[
            "voxel_features"
        ].astype(jnp.float32)
        return batch_dict


def image_vfe_loss(batch_dict, model_cfg, depth_downsample_factor):
    """DDN depth loss (reference ImageVFE.get_loss → DepthFFN.get_loss
    → DDNLoss)."""
    ffn_cfg = model_cfg["FFN"]
    loss_cfg = dict(ffn_cfg["LOSS"].get("ARGS", {}))
    return ddn_loss(
        batch_dict["depth_logits"],
        batch_dict["depth_maps"],
        batch_dict["gt_boxes2d"],
        disc_cfg=dict(ffn_cfg["DISCRETIZE"]),
        downsample_factor=depth_downsample_factor,
        **loss_cfg,
    )
