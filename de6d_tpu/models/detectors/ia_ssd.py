"""IA-SSD detector — exact composition.

Parity: reference detectors/ia_ssd.py:27 with the exact
IASSD_Backbone (backbones_3d/iassd_backbone.py ≙ reference
IASSD_backbone.py:192) and IASSD_Head
(dense_heads/iassd_head.py ≙ reference IASSD_head.py:841): loss =
contextual vote + centerness-scaled center cls + instance-aware SA
losses + bin-orientation box + corner (+ optional IoU3D).
"""

from __future__ import annotations

from ...registry import DETECTORS
from ..backbones_3d.iassd_backbone import IASSD_Backbone  # noqa: F401
from ..dense_heads.iassd_head import IASSD_Head, iassd_head_loss  # noqa: F401
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class IASSD(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        head_cfg = self.model_cfg["POINT_HEAD"]
        num_class = (
            1 if head_cfg.get("CLASS_AGNOSTIC", False) else self.num_class
        )
        loss, tb = iassd_head_loss(batch_dict, head_cfg, num_class)
        tb["loss"] = loss
        return loss, tb
