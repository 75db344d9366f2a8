"""Per-point heads: PointHeadBox (PointRCNN first stage) and
PointHeadSimple (PV-RCNN keypoint segmentation).

Parity: reference dense_heads/point_head_box.py (:115) and
point_head_simple.py (:91), with the shared target-assign helpers of
PointHeadTemplate (:210): fg = point inside gt box, ignore ring via
extra-width-enlarged boxes, box targets from PointResidualCoder.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import geometry
from ...registry import POINT_HEADS
from ...utils import box_coder_utils, loss_utils
from ..model_utils.mlp import FCStack


def assign_point_targets(points, valid, gt_boxes, box_coder=None,
                         extra_width=None, num_class=1,
                         encode_dims=None):
    """(B, N, 3) points vs (B, M, 7+1[+2]) gts →
    cls labels (B, N) {-1,0,1..C}, reg labels (B, N, code) (optional),
    box labels (B, N, ndim).

    encode_dims: optionally truncate gt boxes to this many dims for the
    box-coder encode (PointHeadBox6D encodes only the 7-DoF part; the
    9-DoF angles go through its rotation branch) while fg/ignore still
    use the full 9-DoF containment test.
    """

    def single(pts, v, gt):
        boxes = gt[:, :-1]
        cls_ids = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        use = boxes[:, :9] if boxes.shape[-1] >= 9 else boxes[:, :7]
        idx = geometry.points_in_boxes_index(pts, use, gt_valid)
        fg = (idx >= 0) & v
        safe = jnp.clip(idx, 0, None)
        if extra_width is not None:
            big = geometry.enlarge_box3d(use, extra_width)
            idx_big = geometry.points_in_boxes_index(pts, big, gt_valid)
            ignore = (fg ^ ((idx_big >= 0) & v)) & v
        else:
            ignore = jnp.zeros_like(fg)
        cls_label = jnp.where(
            fg, 1 if num_class == 1 else cls_ids[safe],
            jnp.where(ignore | ~v, -1, 0),
        ).astype(jnp.int32)
        if box_coder is not None:
            enc_src = (
                boxes[safe][:, :encode_dims]
                if encode_dims is not None else boxes[safe]
            )
            # truncate to the coder's declared width: 9-DoF gts (sloped
            # data / SlopeAug) feed 7-DoF heads with pitch/roll appended
            # as trailing extras by the coder — the reference instead
            # hard-asserts 8-col gts (point_head_template.py:69), which
            # would crash its own pointrcnn_slopeaug combination
            enc = box_coder.encode(
                enc_src, pts, cls_ids[safe]
            )[..., : box_coder.code_size]
            reg_label = jnp.where(fg[:, None], enc, 0.0)
        else:
            reg_label = jnp.zeros((pts.shape[0], 1))
        box_label = jnp.where(fg[:, None], boxes[safe], 0.0)
        return cls_label, reg_label, box_label

    return jax.vmap(single)(points, valid, gt_boxes)


@POINT_HEADS.register
class PointHeadSimple(nn.Module):
    """Keypoint foreground segmentation head (PV-RCNN)."""

    model_cfg: dict
    num_class: int
    predict_boxes_when_training: bool = False

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict.get(
            "point_features_before_fusion", batch_dict["point_features"]
        )
        cls_preds = FCStack(
            tuple(self.model_cfg["CLS_FC"]), self.num_class,
            use_bn=self.model_cfg.get("USE_BN", True),
        )(feats, train)
        batch_dict["point_cls_preds"] = cls_preds
        batch_dict["point_cls_scores"] = jnp.max(
            jax.nn.sigmoid(cls_preds), axis=-1
        )
        if train:
            cls_l, _, _ = assign_point_targets(
                batch_dict["point_coords"],
                batch_dict.get(
                    "point_valid",
                    jnp.ones(batch_dict["point_coords"].shape[:2], bool),
                ),
                jax.lax.stop_gradient(batch_dict["gt_boxes"]),
                extra_width=self.model_cfg["TARGET_CONFIG"].get(
                    "GT_EXTRA_WIDTH"
                ),
                num_class=1,
            )
            batch_dict["point_cls_labels"] = cls_l
        return batch_dict


@POINT_HEADS.register
class PointHeadBox(nn.Module):
    """Point-wise cls + box head (PointRCNN first stage,
    reference point_head_box.py)."""

    model_cfg: dict
    num_class: int
    predict_boxes_when_training: bool = False

    def setup(self):
        tcfg = self.model_cfg["TARGET_CONFIG"]
        self.box_coder = box_coder_utils.build_box_coder(
            tcfg["BOX_CODER"], **dict(tcfg.get("BOX_CODER_CONFIG", {}))
        )
        use_bn = self.model_cfg.get("USE_BN", True)
        self.cls_layers = FCStack(
            tuple(self.model_cfg["CLS_FC"]), self.num_class, use_bn=use_bn
        )
        self.box_layers = FCStack(
            tuple(self.model_cfg["REG_FC"]), self.box_coder.code_size,
            use_bn=use_bn,
        )

    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["point_features"]  # (B, N, C)
        coords = batch_dict["point_coords"]  # (B, N, 3)
        valid = batch_dict.get(
            "point_valid", jnp.ones(coords.shape[:2], bool)
        )
        cls_preds = self.cls_layers(feats, train)
        box_preds = self.box_layers(feats, train)
        batch_dict["point_cls_preds"] = cls_preds
        batch_dict["point_reg_preds"] = box_preds
        batch_dict["point_cls_scores"] = jnp.max(
            jax.nn.sigmoid(cls_preds), axis=-1
        )

        if train:
            cls_l, reg_l, box_l = assign_point_targets(
                coords, valid, jax.lax.stop_gradient(batch_dict["gt_boxes"]),
                box_coder=self.box_coder,
                extra_width=self.model_cfg["TARGET_CONFIG"].get(
                    "GT_EXTRA_WIDTH"
                ),
                num_class=self.num_class,
            )
            batch_dict["point_cls_labels"] = cls_l
            batch_dict["point_reg_labels"] = reg_l
            batch_dict["point_box_labels"] = box_l

        if (not train) or self.predict_boxes_when_training:
            pred_classes = jnp.argmax(cls_preds, axis=-1) + 1
            boxes = self.box_coder.decode(box_preds, coords, pred_classes)
            batch_dict["batch_cls_preds"] = cls_preds
            batch_dict["batch_box_preds"] = boxes
            batch_dict["point_box_preds"] = boxes
            batch_dict["cls_preds_normalized"] = False
        return batch_dict


def point_head_box_loss(batch_dict, model_cfg, num_class, box_coder):
    """Focal cls + smooth-L1 reg (reference PointHeadBox.get_loss)."""
    w = model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    cls_labels = batch_dict["point_cls_labels"].reshape(-1)
    cls_preds = batch_dict["point_cls_preds"].reshape(-1, num_class)
    positives = cls_labels > 0
    negatives = cls_labels == 0
    cls_weights = (positives * 1.0 + negatives * 1.0)
    pos_norm = jnp.clip(jnp.sum(positives.astype(jnp.float32)), 1.0, None)
    one_hot = jax.nn.one_hot(jnp.clip(cls_labels, 0, None), num_class + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_loss(
        cls_preds, one_hot, weights=cls_weights / pos_norm
    ).sum() * float(w["point_cls_weight"])

    reg_preds = batch_dict["point_reg_preds"].reshape(
        -1, box_coder.code_size
    )
    reg_labels = batch_dict["point_reg_labels"].reshape(
        -1, box_coder.code_size
    )
    reg_w = positives.astype(jnp.float32) / pos_norm
    reg_loss = loss_utils.smooth_l1_loss(
        reg_preds, reg_labels, weights=reg_w,
        code_weights=w.get("code_weights"),
    ).sum() * float(w["point_box_weight"])
    tb = {"point_loss_cls": cls_loss, "point_loss_box": reg_loss}
    return cls_loss + reg_loss, tb
