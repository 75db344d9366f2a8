"""CaDDN — camera-only (monocular) 3D detector.

Parity: reference models/detectors/caddn.py:38 — module list runs
ImageVFE (DDN depth distribution → frustum → voxel volume) →
Conv2DCollapse → BaseBEVBackbone → AnchorHeadSingle; training loss =
RPN (anchor head) loss + DDN depth loss.
"""

from __future__ import annotations

from ...registry import DETECTORS
from ..backbones_3d.vfe.image_vfe import image_vfe_loss
from ..dense_heads.anchor_head import anchor_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class CaDDN(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        head_cfg = self.model_cfg["DENSE_HEAD"]
        loss_rpn, tb = anchor_head_loss(
            batch_dict,
            head_cfg["LOSS_CONFIG"],
            num_class=self.num_class,
            dir_cfg=head_cfg
            if head_cfg.get("USE_DIRECTION_CLASSIFIER", False)
            else None,
        )
        loss_depth, tb_depth = image_vfe_loss(
            batch_dict, self.model_cfg["VFE"],
            self.spec.depth_downsample_factor,
        )
        tb.update(tb_depth)
        loss = loss_rpn + loss_depth
        tb["loss_rpn"] = loss_rpn
        tb["loss"] = loss
        return loss, tb
