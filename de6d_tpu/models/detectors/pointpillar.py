"""PointPillars detector (reference models/detectors/pointpillar.py:34).

Loss = dense head loss only.
"""

from __future__ import annotations

from ...registry import DETECTORS
from ..dense_heads.anchor_head import anchor_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class PointPillar(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        head_cfg = self.model_cfg["DENSE_HEAD"]
        loss, tb = anchor_head_loss(
            batch_dict,
            head_cfg["LOSS_CONFIG"],
            num_class=self.num_class,
            dir_cfg=head_cfg
            if head_cfg.get("USE_DIRECTION_CLASSIFIER", False)
            else None,
        )
        tb["loss"] = loss
        return loss, tb
