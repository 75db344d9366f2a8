"""Vote-based point heads: PointHeadBoxVote (3DSSD/SASA, 7-DoF) and
PointHeadBox6DVote (Det6D, full-pose with the ground-aware pitch
branch).

Parity: reference dense_heads/point_head_box_vote.py (:813) and
point_head_box6d_vote.py (:14-902):
- candidate slice (SAMPLE_RANGE) → vote FC → clamped 3-D offsets
  (:808-821), vote loss targets by 9-DoF containment on candidates
  (:836-844),
- SA re-aggregation at vote centers over all backbone points (:846),
- shared FC → cls/reg branches (:852-859), decode via the bin coder,
- target assignment by hull containment + ball constraint
  (assign_stack_targets_mask :255-326) or by predicted-box IoU
  (:328-385),
- losses: vote reg (:426-446), cls with optional centerness (:448,
  :542), box loss with yaw bin cls+res and — 6-DoF only — ground-aware
  pitch cls(+focal)+res with roll fixed to 0 (:578-731), optional
  axis-aligned IoU (:484) and corner (:515) regularizers, SASA
  per-layer segmentation loss hook (:733-750).

The reference's CPU scipy-hull containment (its training bottleneck)
is replaced by the exact vectorized OBB test (ops.geometry) on device.

Deviation noted: the reference's centerness uses the LAST column of
the box label as yaw, which for 9-DoF labels is actually roll
(point_head_box6d_vote.py:463); we canonicalize with the true yaw
(column 6).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import geometry, iou3d
from ...registry import POINT_HEADS
from ...utils import box_coder_utils, loss_utils
from ..backbones_3d.pointnet2_modules import PointnetSAModuleFSMSG
from ..model_utils.dtype_utils import compute_dtype
from ..model_utils.mlp import FCStack, SharedMLP


# ---------------------------------------------------------------------------
# target assignment (pure, batched)
# ---------------------------------------------------------------------------

def assign_targets_simple(points, valid, gt_boxes, extra_width=None):
    """Vote targets: fg = inside (enlarged) gt box; reg label = box
    center (reference assign_stack_targets_simple :172-226, called with
    set_ignore_flag=False so the ENLARGED boxes define fg)."""

    def single(pts, v, gt):
        boxes = gt[:, :-1]
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        use = boxes[:, :9] if boxes.shape[-1] >= 9 else boxes[:, :7]
        if extra_width is not None:
            use = geometry.enlarge_box3d(use, extra_width)
        idx = geometry.points_in_boxes_index(pts, use, gt_valid)
        fg = (idx >= 0) & v
        cls_label = jnp.where(v, fg.astype(jnp.int32), -1)
        centers = boxes[jnp.clip(idx, 0, None), 0:3]
        reg_label = jnp.where(fg[:, None], centers, 0.0)
        return cls_label, reg_label

    return jax.vmap(single)(points, valid, gt_boxes)


def assign_targets_mask(points, valid, gt_boxes, box_coder, num_class,
                        central_radius=2.0):
    """Box targets at vote coords: containment + ball constraint
    (reference assign_stack_targets_mask with use_ball_constraint=True,
    :255-326)."""
    code_size = box_coder.code_size

    def single(pts, v, gt):
        boxes = gt[:, :-1]
        cls_ids = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        use = boxes[:, :9] if boxes.shape[-1] >= 9 else boxes[:, :7]
        idx = geometry.points_in_boxes_index(pts, use, gt_valid)
        box_fg = (idx >= 0) & v
        safe_idx = jnp.clip(idx, 0, None)
        centers = boxes[safe_idx, 0:3]
        ball = jnp.linalg.norm(centers - pts, axis=-1) < central_radius
        fg = box_fg & ball
        ignore = box_fg & ~ball
        cls_label = jnp.where(
            fg,
            1 if num_class == 1 else cls_ids[safe_idx],
            jnp.where(ignore | ~v, -1, 0),
        ).astype(jnp.int32)
        enc = box_coder.encode(
            boxes[safe_idx], pts, cls_ids[safe_idx]
        )[..., :code_size]
        reg_label = jnp.where(fg[:, None], enc, 0.0)
        box_label = jnp.where(fg[:, None], boxes[safe_idx], 0.0)
        return cls_label, reg_label, box_label

    return jax.vmap(single)(points, valid, gt_boxes)


def assign_targets_iou(points, valid, pred_boxes, gt_boxes, box_coder,
                       num_class, pos_iou_threshold=0.5,
                       neg_iou_threshold=0.35):
    """IoU-based assignment (reference assign_stack_targets_iou
    :328-385)."""
    code_size = box_coder.code_size

    def single(pts, v, preds, gt):
        boxes = gt[:, :-1]
        cls_ids = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        iou = iou3d.boxes_iou3d(preds[:, :7], boxes[:, :7])
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best = jnp.max(iou, axis=-1)
        arg = jnp.argmax(iou, axis=-1)
        fg = (best > pos_iou_threshold) & v
        ignore = ((best > neg_iou_threshold) & ~fg & v) | ~v
        cls_label = jnp.where(
            fg, 1 if num_class == 1 else cls_ids[arg],
            jnp.where(ignore, -1, 0),
        ).astype(jnp.int32)
        enc = box_coder.encode(boxes[arg], pts, cls_ids[arg])[..., :code_size]
        reg_label = jnp.where(fg[:, None], enc, 0.0)
        box_label = jnp.where(fg[:, None], boxes[arg], 0.0)
        return cls_label, reg_label, box_label

    return jax.vmap(single)(points, valid, pred_boxes, gt_boxes)


def assign_sasa_labels(coords_list, valid_list, gt_boxes, extra_width=None,
                       set_ignore_flag=False):
    """Per-SA-layer fg/bg labels (reference PointSASALoss.assign_target
    loss_utils.py:442-491; 7-DoF containment)."""
    out = []
    for coords, valid in zip(coords_list, valid_list):

        def single(pts, v, gt):
            boxes = gt[:, :7]
            gt_valid = jnp.any(jnp.abs(boxes) > 0, axis=-1)
            big = (
                geometry.enlarge_box3d(boxes, extra_width)
                if extra_width is not None else boxes
            )
            if not set_ignore_flag:
                idx = geometry.points_in_boxes_index(pts, big, gt_valid)
                label = (idx >= 0).astype(jnp.int32)
                return jnp.where(v, label, -1)
            idx = geometry.points_in_boxes_index(pts, boxes, gt_valid)
            idx_big = geometry.points_in_boxes_index(pts, big, gt_valid)
            fg = idx >= 0
            ignore = fg ^ (idx_big >= 0)
            label = jnp.where(ignore, -1, fg.astype(jnp.int32))
            return jnp.where(v, label, -1)

        out.append(jax.vmap(single)(coords, valid, gt_boxes))
    return out


def generate_centerness_label(points, box_labels, pos_mask, epsilon=1e-6):
    """FCOS-style centerness in the box frame (reference :448-482)."""
    canonical = points - box_labels[..., 0:3]
    yaw = box_labels[..., 6]
    canonical = geometry.rotate_points_along_z(
        canonical[:, None, :], -yaw
    ).squeeze(1)
    half = box_labels[..., 3:6] / 2.0
    front = half[..., 0] - canonical[..., 0]
    back = half[..., 0] + canonical[..., 0]
    left = half[..., 1] - canonical[..., 1]
    right = half[..., 1] + canonical[..., 1]
    top = half[..., 2] - canonical[..., 2]
    bottom = half[..., 2] + canonical[..., 2]

    def ratio(a, b):
        return jnp.minimum(a, b) / jnp.clip(jnp.maximum(a, b), epsilon, None)

    c = ratio(front, back) * ratio(left, right) * ratio(top, bottom)
    c = jnp.clip(c, epsilon, None) ** (1.0 / 3.0)
    return jnp.where(pos_mask, c, 0.0)


def axis_aligned_iou_loss(pred_boxes, gt_boxes):
    """1 − axis-aligned 3D IoU (reference :485-515)."""
    iou = iou3d.boxes_aligned_iou3d(pred_boxes, gt_boxes)
    return 1.0 - iou


# ---------------------------------------------------------------------------
# head module
# ---------------------------------------------------------------------------

class _PointHeadVoteBase(nn.Module):
    model_cfg: dict
    num_class: int
    predict_boxes_when_training: bool = False

    def setup(self):
        target_cfg = self.model_cfg["TARGET_CONFIG"]
        self.box_coder = box_coder_utils.build_box_coder(
            target_cfg["BOX_CODER"], **dict(target_cfg.get("BOX_CODER_CONFIG", {}))
        )
        use_bn = self.model_cfg.get("USE_BN", True)
        dt = compute_dtype(self.model_cfg)
        vote_cfg = self.model_cfg["VOTE_CONFIG"]
        # vote layers stay fp32: their output is geometry (3-D center
        # offsets); bf16 would quantize vote coords to ~centimeters
        self.vote_layers = FCStack(
            tuple(vote_cfg["VOTE_FC"]), 3, use_bn=use_bn
        )
        self.max_translation = tuple(vote_cfg["MAX_TRANSLATION_RANGE"])

        sa_cfg = self.model_cfg["SA_CONFIG"]
        self.sa_module = PointnetSAModuleFSMSG(
            radii=tuple(float(r) for r in sa_cfg["RADIUS"]),
            nsamples=tuple(int(s) for s in sa_cfg["NSAMPLE"]),
            mlps=tuple(tuple(m) for m in sa_cfg["MLPS"]),
            use_xyz=True,
            use_bn=use_bn,
            dtype=dt,
        )
        self.shared_fc = SharedMLP(
            tuple(self.model_cfg["SHARED_FC"]), use_bn=use_bn, dtype=dt
        )
        self.cls_layers = FCStack(
            tuple(self.model_cfg["CLS_FC"]), self.num_class, use_bn=use_bn,
            dtype=dt,
        )
        self.reg_layers = FCStack(
            tuple(self.model_cfg["REG_FC"]), self.box_coder.code_size,
            use_bn=use_bn, dtype=dt,
        )

    def __call__(self, batch_dict, train: bool = False):
        coords = batch_dict["point_coords"]  # (B, N, 3)
        features = batch_dict["point_features"]  # (B, N, C)
        valid = batch_dict.get(
            "point_valid", jnp.ones(coords.shape[:2], bool)
        )

        lo, hi = self.model_cfg["SAMPLE_RANGE"]
        hi = coords.shape[1] if hi == -1 else int(hi)
        cand_coords = coords[:, lo:hi]
        cand_features = features[:, lo:hi]
        cand_valid = valid[:, lo:hi]

        offsets = self.vote_layers(cand_features, train)  # (B, Nc, 3)
        rng = jnp.asarray(self.max_translation, offsets.dtype)
        offsets = jnp.clip(offsets, -rng, rng)
        vote_coords = cand_coords + offsets

        batch_dict["point_candidate_coords"] = cand_coords
        batch_dict["point_vote_coords"] = vote_coords
        batch_dict["point_vote_valid"] = cand_valid

        _, vote_features, _, _ = self.sa_module(
            coords, features, valid,
            new_xyz=vote_coords, new_valid=cand_valid, train=train,
        )
        shared = self.shared_fc(vote_features, train)
        cls_preds = self.cls_layers(shared, train)  # (B, Nc, ncls)
        reg_preds = self.reg_layers(shared, train)  # (B, Nc, code)

        point_box_preds = self.box_coder.decode(
            reg_preds, vote_coords,
            jnp.argmax(cls_preds, axis=-1) + 1,
        )
        batch_dict["point_cls_preds"] = cls_preds
        batch_dict["point_reg_preds"] = reg_preds
        batch_dict["point_box_preds"] = point_box_preds
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(cls_preds)

        if train:
            ret = self.build_targets(batch_dict)
            batch_dict.update(ret)

        if (not train) or self.predict_boxes_when_training:
            batch_dict["batch_cls_preds"] = cls_preds
            batch_dict["batch_box_preds"] = point_box_preds
            batch_dict["cls_preds_normalized"] = False
        return batch_dict

    def build_targets(self, batch_dict):
        target_cfg = self.model_cfg["TARGET_CONFIG"]
        gt_boxes = jax.lax.stop_gradient(batch_dict["gt_boxes"])
        cand = batch_dict["point_candidate_coords"]
        votes = batch_dict["point_vote_coords"]
        vvalid = batch_dict["point_vote_valid"]

        vote_cls, vote_reg = assign_targets_simple(
            cand, vvalid, gt_boxes,
            extra_width=target_cfg.get("VOTE_EXTRA_WIDTH", None),
        )
        ret = {
            "vote_cls_labels": vote_cls,
            "vote_reg_labels": vote_reg,
        }
        method = target_cfg.get("ASSIGN_METHOD", "mask")
        if method == "mask":
            cls_l, reg_l, box_l = assign_targets_mask(
                jax.lax.stop_gradient(votes), vvalid, gt_boxes,
                self.box_coder, self.num_class,
                central_radius=float(
                    target_cfg.get("GT_CENTRAL_RADIUS", 2.0)
                ),
            )
        elif method == "iou":
            cls_l, reg_l, box_l = assign_targets_iou(
                jax.lax.stop_gradient(votes), vvalid,
                jax.lax.stop_gradient(batch_dict["point_box_preds"]),
                gt_boxes, self.box_coder, self.num_class,
                pos_iou_threshold=float(target_cfg["POS_IOU_THRESHOLD"]),
                neg_iou_threshold=float(target_cfg["NEG_IOU_THRESHOLD"]),
            )
        else:
            raise NotImplementedError(method)
        ret.update(
            point_cls_labels=cls_l,
            point_reg_labels=reg_l,
            point_box_labels=box_l,
        )

        sasa_cfg = self.model_cfg["LOSS_CONFIG"].get("LOSS_SASA_CONFIG")
        if sasa_cfg is not None:
            labels = assign_sasa_labels(
                batch_dict["point_coords_list"],
                batch_dict["point_valid_list"],
                gt_boxes,
                extra_width=sasa_cfg.get("extra_width", None),
                set_ignore_flag=sasa_cfg.get("set_ignore_flag", False),
            )
            ret["point_sasa_labels"] = labels
            ret["point_sasa_preds"] = batch_dict["point_scores_list"]
        return ret


@POINT_HEADS.register
class PointHeadBoxVote(_PointHeadVoteBase):
    """7-DoF vote head (3DSSD / SASA)."""


@POINT_HEADS.register
class PointHeadBox6DVote(_PointHeadVoteBase):
    """Full-pose Det6D head — same structure; the 6-DoF behavior comes
    from PointBinResidual6DCoder + the pitch branch in the loss."""


# ---------------------------------------------------------------------------
# losses (pure)
# ---------------------------------------------------------------------------

def point_vote_head_loss(batch_dict, model_cfg, num_class, box_coder):
    """Total head loss (reference get_loss :752-776 + sub-losses)."""
    loss_cfg = model_cfg["LOSS_CONFIG"]
    w = loss_cfg["LOSS_WEIGHTS"]
    tb = {}

    # ---- vote regression -------------------------------------------------
    vote_cls = batch_dict["vote_cls_labels"].reshape(-1)
    vote_reg_l = batch_dict["vote_reg_labels"].reshape(-1, 3)
    vote_pred = batch_dict["point_vote_coords"].reshape(-1, 3)
    pos = (vote_cls > 0).astype(jnp.float32)
    norm = jnp.clip(jnp.sum(pos), 1.0, None)
    vote_loss = loss_utils.smooth_l1_loss(
        vote_pred, vote_reg_l, weights=pos / norm
    ).sum() * float(w["vote_reg_weight"])
    tb["vote_loss_reg"] = vote_loss

    # ---- classification --------------------------------------------------
    cls_labels = batch_dict["point_cls_labels"].reshape(-1)
    cls_preds = batch_dict["point_cls_preds"].reshape(-1, num_class)
    positives = cls_labels > 0
    negatives = cls_labels == 0
    cls_weights = (positives | negatives).astype(jnp.float32)
    one_hot = jax.nn.one_hot(
        jnp.clip(cls_labels, 0, None), num_class + 1
    )[..., 1:]

    if "WithCenterness" in str(loss_cfg["LOSS_CLS"]):
        votes = batch_dict["point_vote_coords"].reshape(-1, 3)
        box_labels = batch_dict["point_box_labels"].reshape(
            -1, batch_dict["point_box_labels"].shape[-1]
        )
        centerness = generate_centerness_label(votes, box_labels, positives)
        cls_cfg = loss_cfg.get("LOSS_CLS_CONFIG", {}) or {}
        cmin = float(cls_cfg.get("centerness_min", 0.0))
        cmax = float(cls_cfg.get("centerness_max", 1.0))
        centerness = cmin + (cmax - cmin) * centerness
        one_hot = one_hot * centerness[:, None]

    if str(loss_cfg["LOSS_CLS"]).startswith("WeightedBinaryCrossEntropy"):
        cls_loss_vec = loss_utils.weighted_binary_cross_entropy(
            cls_preds, one_hot, weights=cls_weights
        )
    else:
        cls_loss_vec = loss_utils.sigmoid_focal_loss(
            cls_preds, one_hot, weights=cls_weights
        ).sum(-1)
    cls_norm = jnp.clip(jnp.sum(cls_weights), 1.0, None)
    cls_loss = cls_loss_vec.sum() / cls_norm * float(w["point_cls_weight"])
    tb["point_loss_cls"] = cls_loss
    tb["point_pos_num"] = jnp.sum(positives)

    # ---- box regression --------------------------------------------------
    reg_preds = batch_dict["point_reg_preds"].reshape(
        -1, box_coder.code_size
    )
    reg_labels = batch_dict["point_reg_labels"].reshape(
        -1, box_coder.code_size
    )
    reg_w = positives.astype(jnp.float32)
    box_norm = jnp.clip(jnp.sum(reg_w), 1.0, None)

    offset_loss = loss_utils.smooth_l1_loss(
        reg_preds[:, :6], reg_labels[:, :6], weights=reg_w
    ).sum(-1) * float(w["point_offset_reg_weight"])
    box_loss_vec = offset_loss

    nb = getattr(box_coder, "angle_bin_num", 0)
    if nb:
        cls_slice = slice(6, 6 + nb)
        res_slice = slice(6 + nb, 6 + 2 * nb)
        angle_cls_l = reg_labels[:, cls_slice]
        angle_cls_loss = loss_utils.softmax_cross_entropy(
            reg_preds[:, cls_slice], angle_cls_l
        ) * reg_w * float(w["point_angle_cls_weight"])
        res_pred = (reg_preds[:, res_slice] * angle_cls_l).sum(-1, keepdims=True)
        res_label = (reg_labels[:, res_slice] * angle_cls_l).sum(-1, keepdims=True)
        angle_reg_loss = loss_utils.smooth_l1_loss(
            res_pred, res_label, weights=reg_w
        ).sum(-1) * float(w["point_angle_reg_weight"])
        box_loss_vec = box_loss_vec + angle_cls_loss + angle_reg_loss

        if isinstance(box_coder, box_coder_utils.PointBinResidual6DCoder):
            base = 6 + 2 * nb
            if box_coder.ground_aware:
                pitch_cls_l = reg_labels[:, base : base + 1]
                pitch_cls_loss = loss_utils.sigmoid_focal_loss(
                    reg_preds[:, base : base + 1], pitch_cls_l,
                    weights=reg_w,
                ).squeeze(-1) * float(w["point_pitch_cls_weight"])
                pitch_w = (pitch_cls_l[:, 0] > 0).astype(jnp.float32)
                pitch_pred = reg_preds[:, base + 1 : base + 2]
                pitch_label = reg_labels[:, base + 1 : base + 2]
                box_loss_vec = box_loss_vec + pitch_cls_loss
            else:
                pitch_w = reg_w
                pitch_pred = reg_preds[:, base : base + 1]
                pitch_label = reg_labels[:, base : base + 1]
            pitch_reg_loss = loss_utils.smooth_l1_loss(
                pitch_pred, pitch_label, weights=pitch_w
            ).sum(-1)
            # renormalize: pitch-fg count instead of all-fg count
            # (reference :696-700)
            pitch_reg_loss = pitch_reg_loss * box_norm / jnp.clip(
                jnp.sum(pitch_w), 1.0, None
            ) * float(w["point_pitch_reg_weight"])
            box_loss_vec = box_loss_vec + pitch_reg_loss
    else:
        angle_reg_loss = loss_utils.smooth_l1_loss(
            reg_preds[:, 6:], reg_labels[:, 6:], weights=reg_w
        ).sum(-1) * float(w["point_angle_reg_weight"])
        box_loss_vec = box_loss_vec + angle_reg_loss

    # aux regularizers on decoded boxes
    box_preds = batch_dict["point_box_preds"].reshape(
        -1, batch_dict["point_box_preds"].shape[-1]
    )
    box_labels_full = batch_dict["point_box_labels"].reshape(
        -1, batch_dict["point_box_labels"].shape[-1]
    )
    aux = jnp.zeros_like(box_loss_vec)
    if loss_cfg.get("AXIS_ALIGNED_IOU_LOSS_REGULARIZATION", False):
        iou_l = axis_aligned_iou_loss(
            box_preds[:, :7], box_labels_full[:, :7]
        ) * float(w["point_iou_weight"])
        aux = aux + jnp.where(positives, iou_l, 0.0)
    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        corner_l = loss_utils.get_corner_loss_lidar(
            box_preds[:, :7], box_labels_full[:, :7]
        ) * float(w["point_corner_weight"])
        aux = aux + jnp.where(positives, corner_l, 0.0)
    box_loss_vec = box_loss_vec + aux

    box_loss = box_loss_vec.sum() / box_norm
    tb["point_loss_box"] = box_loss

    total = vote_loss + cls_loss + box_loss

    # ---- SASA ------------------------------------------------------------
    sasa_cfg = loss_cfg.get("LOSS_SASA_CONFIG")
    if sasa_cfg is not None and "point_sasa_labels" in batch_dict:
        layer_weights = sasa_cfg.get("layer_weights")
        sasa_total = 0.0
        for i, (preds, labels) in enumerate(
            zip(batch_dict["point_sasa_preds"], batch_dict["point_sasa_labels"])
        ):
            if preds is None:
                continue
            lw = float(layer_weights[i]) if layer_weights else 1.0
            if lw <= 0:
                continue
            p = preds.reshape(-1)
            l = labels.reshape(-1)
            cared = l >= 0
            weights = cared.astype(jnp.float32)
            tgt = jnp.clip(l, 0, 1).astype(jnp.float32)
            if str(sasa_cfg.get("func", "BCE")) == "Focal":
                lvec = loss_utils.sigmoid_focal_loss(
                    p[:, None], tgt[:, None], weights=weights
                ).sum(-1)
            else:
                lvec = loss_utils.weighted_binary_cross_entropy(
                    p[:, None], tgt[:, None], weights=weights
                )
            layer_loss = lw * lvec.sum() / jnp.clip(weights.sum(), 1.0, None)
            sasa_total = sasa_total + layer_loss
            tb[f"point_loss_sasa_layer_{i}"] = layer_loss
        tb["point_loss_sasa"] = sasa_total
        total = total + sasa_total

    tb["point_loss"] = total
    return total, tb
