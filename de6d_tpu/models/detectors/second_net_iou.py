"""SECOND-IoU detector (reference detectors/second_net_iou.py:177).

SECOND + BEV IoU head; at inference the final score fuses the cls
score with the predicted IoU per SCORE_TYPE ∈ {iou, cls, weighted_iou_cls}
(reference :124-147 — 'num_pts' scoring is intentionally omitted: it
needs per-box point counts that the fixed-shape pipeline exposes via
points_in_boxes if ever needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ..dense_heads.anchor_head import anchor_head_loss
from ..roi_heads.second_head import second_iou_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class SECONDNetIoU(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        head_cfg = self.model_cfg["DENSE_HEAD"]
        loss_rpn, tb = anchor_head_loss(
            batch_dict, head_cfg["LOSS_CONFIG"], num_class=self.num_class,
            dir_cfg=head_cfg
            if head_cfg.get("USE_DIRECTION_CLASSIFIER", False) else None,
        )
        loss_iou, tb2 = second_iou_head_loss(
            batch_dict, self.model_cfg["ROI_HEAD"]["LOSS_CONFIG"]
        )
        tb.update(tb2)
        loss = loss_rpn + loss_iou
        tb["loss"] = loss
        return loss, tb

    @staticmethod
    def fuse_scores(batch_dict, score_type: str = "weighted_iou_cls",
                    iou_weight: float = 0.5):
        """Score fusion for post-processing (reference :124-147)."""
        rois = batch_dict["rois"]
        roi_scores = batch_dict["roi_scores"]
        iou_pred = (batch_dict["rcnn_iou"] + 1.0) / 2.0  # back to [0,1]
        if score_type == "cls":
            scores = roi_scores
        elif score_type == "iou":
            scores = iou_pred
        else:  # weighted_iou_cls
            scores = iou_weight * iou_pred + (1 - iou_weight) * roi_scores
        batch_dict["batch_box_preds"] = rois
        batch_dict["batch_cls_preds"] = scores[..., None]
        batch_dict["cls_preds_normalized"] = True
        return batch_dict
