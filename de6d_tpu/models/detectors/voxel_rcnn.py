"""Voxel-RCNN detector (reference detectors/voxel_rcnn.py:32)."""

from __future__ import annotations

from ...registry import DETECTORS
from ..dense_heads.anchor_head import anchor_head_loss
from ..roi_heads.roi_head_utils import roi_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class VoxelRCNN(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        dense_cfg = self.model_cfg["DENSE_HEAD"]
        loss_rpn, tb = anchor_head_loss(
            batch_dict, dense_cfg["LOSS_CONFIG"], num_class=self.num_class,
            dir_cfg=dense_cfg
            if dense_cfg.get("USE_DIRECTION_CLASSIFIER", False) else None,
        )
        loss_rcnn, tb2 = roi_head_loss(
            batch_dict["roi_targets_dict"],
            self.model_cfg["ROI_HEAD"]["LOSS_CONFIG"],
        )
        tb.update(tb2)
        loss = loss_rpn + loss_rcnn
        tb["loss"] = loss
        return loss, tb
