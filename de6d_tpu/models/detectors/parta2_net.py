"""Part-A2 detector (reference detectors/PartA2_net.py:31).

MeanVFE → UNetV2 → HeightCompression → BaseBEVBackbone →
AnchorHeadSingle → PointIntraPartOffsetHead → PartA2FCHead.
Loss = anchor head + part seg/reg + rcnn.
"""

from __future__ import annotations

from ...registry import DETECTORS
from ..dense_heads.anchor_head import anchor_head_loss
from ..dense_heads.point_intra_part_head import part_head_loss
from ..roi_heads.roi_head_utils import roi_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class PartA2Net(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        dense_cfg = self.model_cfg["DENSE_HEAD"]
        loss_rpn, tb = anchor_head_loss(
            batch_dict, dense_cfg["LOSS_CONFIG"], num_class=self.num_class,
            dir_cfg=dense_cfg
            if dense_cfg.get("USE_DIRECTION_CLASSIFIER", False) else None,
        )
        loss_part, tb2 = part_head_loss(
            batch_dict, self.model_cfg["POINT_HEAD"]["LOSS_CONFIG"]
        )
        loss_rcnn, tb3 = roi_head_loss(
            batch_dict["roi_targets_dict"],
            self.model_cfg["ROI_HEAD"]["LOSS_CONFIG"],
        )
        tb.update(tb2)
        tb.update(tb3)
        loss = loss_rpn + loss_part + loss_rcnn
        tb["loss"] = loss
        return loss, tb
