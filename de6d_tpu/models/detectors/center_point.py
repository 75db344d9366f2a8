"""CenterPoint detector (reference detectors/centerpoint.py:50)."""

from __future__ import annotations

from ...registry import DETECTORS
from ..dense_heads.center_head import center_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class CenterPoint(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        loss, tb = center_head_loss(
            batch_dict, self.model_cfg["DENSE_HEAD"]["LOSS_CONFIG"]
        )
        tb["loss"] = loss
        return loss, tb
