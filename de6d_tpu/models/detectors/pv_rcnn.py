"""PV-RCNN detector (reference detectors/pv_rcnn.py:31).

MeanVFE → VoxelBackBone8x → HeightCompression → VoxelSetAbstraction →
BaseBEVBackbone → AnchorHeadSingle → PointHeadSimple → PVRCNNHead.
Loss = anchor head + keypoint segmentation + rcnn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ...utils import loss_utils
from ..dense_heads.anchor_head import anchor_head_loss
from ..roi_heads.roi_head_utils import roi_head_loss
from .detector3d_template import Detector3DTemplate


@DETECTORS.register
class PVRCNN(Detector3DTemplate):
    def get_training_loss(self, batch_dict):
        dense_cfg = self.model_cfg["DENSE_HEAD"]
        loss_rpn, tb = anchor_head_loss(
            batch_dict, dense_cfg["LOSS_CONFIG"], num_class=self.num_class,
            dir_cfg=dense_cfg
            if dense_cfg.get("USE_DIRECTION_CLASSIFIER", False) else None,
        )

        # keypoint segmentation loss (PointHeadSimple)
        pt_cfg = self.model_cfg["POINT_HEAD"]
        w = pt_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        cls_labels = batch_dict["point_cls_labels"].reshape(-1)
        cls_preds = batch_dict["point_cls_preds"].reshape(-1, 1)
        positives = cls_labels > 0
        negatives = cls_labels == 0
        cls_weights = (positives | negatives).astype(jnp.float32)
        pos_norm = jnp.clip(
            jnp.sum(positives.astype(jnp.float32)), 1.0, None
        )
        one_hot = jnp.clip(cls_labels, 0, 1).astype(jnp.float32)[:, None]
        loss_point = loss_utils.sigmoid_focal_loss(
            cls_preds, one_hot, weights=cls_weights / pos_norm
        ).sum() * float(w["point_cls_weight"])
        tb["point_loss_cls"] = loss_point

        loss_rcnn, tb2 = roi_head_loss(
            batch_dict["roi_targets_dict"],
            self.model_cfg["ROI_HEAD"]["LOSS_CONFIG"],
        )
        tb.update(tb2)
        loss = loss_rpn + loss_point + loss_rcnn
        tb["loss"] = loss
        return loss, tb
