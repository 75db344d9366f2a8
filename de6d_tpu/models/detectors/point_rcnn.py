"""PointRCNN two-stage detector (reference detectors/point_rcnn.py:31).

PointNet2MSG → PointHeadBox (stage 1) → PointRCNNHead (stage 2).
Loss = point head loss + rcnn loss.
"""

from __future__ import annotations

from ...registry import DETECTORS
from ...utils import box_coder_utils
from ..dense_heads.point_head_box import point_head_box_loss
from ..roi_heads.roi_head_utils import roi_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class PointRCNN(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        head_cfg = self.model_cfg["POINT_HEAD"]
        tcfg = head_cfg["TARGET_CONFIG"]
        coder = box_coder_utils.build_box_coder(
            tcfg["BOX_CODER"], **dict(tcfg.get("BOX_CODER_CONFIG", {}))
        )
        num_class = (
            1 if head_cfg.get("CLASS_AGNOSTIC", False) else self.num_class
        )
        point_loss, tb = point_head_box_loss(
            batch_dict, head_cfg, num_class, coder
        )
        rcnn_loss, tb2 = roi_head_loss(
            batch_dict["roi_targets_dict"],
            self.model_cfg["ROI_HEAD"]["LOSS_CONFIG"],
        )
        tb.update(tb2)
        loss = point_loss + rcnn_loss
        tb["loss"] = loss
        return loss, tb
