"""PointHeadBox6D — direct-regression full-pose point head.

Parity: reference dense_heads/point_head_box6d.py:32-367 (the paper's
D.R. ablation row): per-point FC branches for class, 7-DoF box code,
slope classification (2-way: has-pitch) and axis-angle rotation
regression. Targets: fg = point inside the 9-DoF gt hull (device OBB
test replaces the reference's scipy-Delaunay CPU hulls), ignore ring
from enlarged boxes, rotation target = rotvec of the gt euler zyx,
slope label = gt pitch < -0.1 (fg only, else -1). Inference decodes
the 7-DoF code, converts the predicted rotvec back to euler and
appends (pitch, roll), zeroing pitch when the slope classifier says
flat — yaw always comes from the 7-DoF coder.

Losses (reference get_loss :242-255): focal cls + smooth-L1 box +
MSE rotvec (pos only) + focal(gamma=1) slope cls.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import geometry
from ...registry import POINT_HEADS
from ...utils import box_coder_utils, loss_utils
from ..model_utils.dtype_utils import compute_dtype
from ..model_utils.mlp import FCStack
from .point_head_box import assign_point_targets


def assign_rot_targets(points, valid, gt_boxes):
    """Per-point rotation targets from 9-DoF gts.

    Returns:
        rot_cls (B, N) int32 {-1 ignore, 0 flat, 1 sloped},
        rot_reg (B, N, 3) axis-angle of the owning gt's euler zyx.
    """

    def single(pts, v, gt):
        boxes = gt[:, :-1]
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        idx = geometry.points_in_boxes_index(pts, boxes[:, :9], gt_valid)
        fg = (idx >= 0) & v
        safe = jnp.clip(idx, 0, None)
        own = boxes[safe]
        rotvec = geometry.euler_zyx_to_rotvec(
            own[:, 6], own[:, 7], own[:, 8]
        )
        rot_reg = jnp.where(fg[:, None], rotvec, 0.0)
        sloped = own[:, 7] < -0.1
        rot_cls = jnp.where(
            fg, sloped.astype(jnp.int32), -1
        ).astype(jnp.int32)
        return rot_cls, rot_reg

    return jax.vmap(single)(points, valid, gt_boxes)


@POINT_HEADS.register
class PointHeadBox6D(nn.Module):
    model_cfg: dict
    num_class: int
    predict_boxes_when_training: bool = False

    def setup(self):
        tcfg = self.model_cfg["TARGET_CONFIG"]
        self.box_coder = box_coder_utils.build_box_coder(
            tcfg["BOX_CODER"], **dict(tcfg.get("BOX_CODER_CONFIG", {}))
        )
        use_bn = self.model_cfg.get("USE_BN", True)
        dt = compute_dtype(self.model_cfg)
        self.cls_layers = FCStack(
            tuple(self.model_cfg["CLS_FC"]), self.num_class, use_bn=use_bn,
            dtype=dt,
        )
        self.box_layers = FCStack(
            tuple(self.model_cfg["REG_FC"]), self.box_coder.code_size,
            use_bn=use_bn, dtype=dt,
        )
        self.rot_cls_layers = FCStack(
            tuple(self.model_cfg["ROT_CLS_FC"]), 2, use_bn=use_bn, dtype=dt
        )
        self.rot_reg_layers = FCStack(
            tuple(self.model_cfg["ROT_REG_FC"]), 3, use_bn=use_bn, dtype=dt
        )

    def __call__(self, batch_dict, train: bool = False):
        feats = (
            batch_dict["point_features_before_fusion"]
            if self.model_cfg.get("USE_POINT_FEATURES_BEFORE_FUSION", False)
            else batch_dict["point_features"]
        )  # (B, N, C)
        coords = batch_dict["point_coords"]  # (B, N, 3)
        valid = batch_dict.get(
            "point_valid", jnp.ones(coords.shape[:2], bool)
        )
        cls_preds = self.cls_layers(feats, train)
        box_preds = self.box_layers(feats, train)
        rot_cls_preds = self.rot_cls_layers(feats, train)
        rot_reg_preds = self.rot_reg_layers(feats, train)
        batch_dict["point_cls_preds"] = cls_preds
        batch_dict["point_reg_preds"] = box_preds
        batch_dict["point_rot_cls_preds"] = rot_cls_preds
        batch_dict["point_rot_reg_preds"] = rot_reg_preds
        batch_dict["point_cls_scores"] = jnp.max(
            jax.nn.sigmoid(cls_preds), axis=-1
        )

        if train:
            gt = jax.lax.stop_gradient(batch_dict["gt_boxes"])
            cls_l, reg_l, box_l = assign_point_targets(
                coords, valid, gt,
                box_coder=self.box_coder,
                extra_width=self.model_cfg["TARGET_CONFIG"].get(
                    "GT_EXTRA_WIDTH"
                ),
                num_class=self.num_class,
                encode_dims=7,
            )
            rot_cls_l, rot_reg_l = assign_rot_targets(coords, valid, gt)
            batch_dict["point_cls_labels"] = cls_l
            batch_dict["point_reg_labels"] = reg_l
            batch_dict["point_box_labels"] = box_l
            batch_dict["point_rot_cls_labels"] = rot_cls_l
            batch_dict["point_rot_reg_labels"] = rot_reg_l

        if (not train) or self.predict_boxes_when_training:
            pred_classes = jnp.argmax(cls_preds, axis=-1) + 1
            boxes7 = self.box_coder.decode(box_preds, coords, pred_classes)
            euler = geometry.rotvec_to_euler_zyx(rot_reg_preds)
            flat = jnp.argmax(rot_cls_preds, axis=-1) == 0
            pitch = jnp.where(flat, 0.0, euler[..., 1])
            boxes9 = jnp.concatenate(
                [boxes7, pitch[..., None], euler[..., 2:3]], axis=-1
            )
            batch_dict["batch_cls_preds"] = cls_preds
            batch_dict["batch_box_preds"] = boxes9
            batch_dict["point_box_preds"] = boxes9
            batch_dict["cls_preds_normalized"] = False
        return batch_dict


def point_head_box6d_loss(batch_dict, model_cfg, num_class, box_coder):
    """cls + box + rot-reg (MSE, pos only) + rot-cls (focal gamma=1)."""
    from .point_head_box import point_head_box_loss

    total, tb = point_head_box_loss(
        batch_dict, model_cfg, num_class, box_coder
    )
    w = model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    pos = batch_dict["point_cls_labels"].reshape(-1) > 0

    rot_reg_preds = batch_dict["point_rot_reg_preds"].reshape(-1, 3)
    rot_reg_labels = batch_dict["point_rot_reg_labels"].reshape(-1, 3)
    sq = (rot_reg_preds - rot_reg_labels) ** 2
    n_pos = jnp.clip(jnp.sum(pos.astype(jnp.float32)), 1.0, None)
    # reference F.mse_loss(preds[pos], labels[pos]): mean over pos*3
    rot_reg_loss = (
        jnp.sum(jnp.where(pos[:, None], sq, 0.0)) / (n_pos * 3)
    ) * float(w["point_rot_reg_weight"])

    rot_cls_labels = batch_dict["point_rot_cls_labels"].reshape(-1)
    rot_cls_preds = batch_dict["point_rot_cls_preds"].reshape(-1, 2)
    rpos = rot_cls_labels > 0
    rneg = rot_cls_labels == 0
    cls_w = (rpos + rneg).astype(jnp.float32)
    cls_w = cls_w / jnp.clip(jnp.sum(cls_w), 1.0, None)
    one_hot = jax.nn.one_hot(jnp.clip(rot_cls_labels, 0, None), 2)
    rot_cls_loss = loss_utils.sigmoid_focal_loss(
        rot_cls_preds, one_hot, weights=cls_w, alpha=0.25, gamma=1.0
    ).sum() * float(w["point_rot_cls_weight"])

    tb["point_loss_rot_reg"] = rot_reg_loss
    tb["point_loss_rot_cls"] = rot_cls_loss
    total = total + rot_reg_loss + rot_cls_loss
    return total, tb
