"""Exact IASSD_Head.

Parity: reference dense_heads/IASSD_head.py:10-841:
- FC heads over the vote-center features: class logits, bin-orientation
  box code, optional IoU3D branch;
- targets: center assignment inside (optionally per-class-enlarged)
  gts with an extra-width ignore ring; centers_origin assignment with
  the extend_gt method (instance points keep their tight-box gt); per-
  SA-layer instance labels with a [0.5 m] extension;
- losses: contextual vote loss (per-class instance mean), center
  classification with centerness-scaled one-hot targets
  (WeightedClassificationLoss = per-class sigmoid BCE), per-layer
  instance-aware SA losses (centerness-scaled on ctr-sampled layers),
  bin-orientation box loss, corner loss, optional IoU3D loss.

TPU-first: the reference's per-batch/per-instance python loops become
masked segment math over fixed (B, N) shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import geometry, iou3d
from ...registry import POINT_HEADS
from ...utils import box_coder_utils, loss_utils
from ..model_utils.mlp import FCStack


def _centerness(points, boxes, eps=1e-6):
    """(N, 3) points in their (N, 7+) owner boxes → (N,) centerness
    (reference generate_center_ness_mask :626-650)."""
    offset = points - boxes[:, 0:3]
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    x = offset[:, 0] * c - offset[:, 1] * s
    y = offset[:, 0] * s + offset[:, 1] * c
    local = jnp.stack([x, y, offset[:, 2]], axis=-1)
    half = boxes[:, 3:6] / 2
    d_pos = half - local
    d_neg = half + local
    dmin = jnp.minimum(d_pos, d_neg)
    dmax = jnp.maximum(d_pos, d_neg)
    ratio = dmin / jnp.clip(dmax, eps, None)
    cness = jnp.clip(ratio[:, 0] * ratio[:, 1] * ratio[:, 2], eps, None)
    return cness ** (1.0 / 3.0)


def assign_iassd_targets(points, valid, gt_boxes, box_coder=None,
                         extra_width=None, num_class=1,
                         use_ex_gt_assign=False, set_ignore_flag=True,
                         ret_box_labels=False):
    """Vectorized assign_stack_targets_IASSD (reference :124-236).

    points (B, N, 3); gt_boxes (B, M, 8). Returns dict with
    point_cls_labels (B, N), box_idx (B, N), gt_box_of_points
    (B, N, 8)[, point_box_labels (B, N, code)].
    """

    def single(pts, v, gt):
        boxes = gt[:, :-1]
        cls_ids = gt[:, -1].astype(jnp.int32)
        gt_valid = jnp.any(jnp.abs(boxes[:, :7]) > 0, axis=-1)
        idx_t = geometry.points_in_boxes_index(pts, boxes[:, :7], gt_valid)
        if extra_width is not None:
            big = geometry.enlarge_box3d(boxes[:, :7], extra_width)
            idx_e = geometry.points_in_boxes_index(pts, big, gt_valid)
        else:
            idx_e = idx_t

        if use_ex_gt_assign:
            # extended fg; instance (tight) points keep their own gt
            idx = jnp.where(idx_t >= 0, idx_t, idx_e)
            fg = (idx >= 0) & v
            ignore = jnp.zeros_like(fg)
        elif set_ignore_flag:
            idx = idx_t
            fg = (idx >= 0) & v
            ignore = (fg ^ ((idx_e >= 0) & v)) & v
        else:
            idx = idx_t
            fg = (idx >= 0) & v
            ignore = jnp.zeros_like(fg)

        safe = jnp.clip(idx, 0, None)
        label = jnp.where(
            fg, 1 if num_class == 1 else cls_ids[safe],
            jnp.where(ignore, -1, 0),
        ).astype(jnp.int32)
        own = jnp.where(fg[:, None], gt[safe], 0.0)
        out = {
            "cls_labels": label,
            "box_idx": jnp.where(fg, idx, -1),
            "gt_box_of_points": own,
        }
        if ret_box_labels and box_coder is not None:
            enc = box_coder.encode(
                boxes[safe][:, :7], pts, cls_ids[safe]
            )
            out["box_labels"] = jnp.where(fg[:, None], enc, 0.0)
        return out

    return jax.vmap(single)(points, valid, gt_boxes)


@POINT_HEADS.register
class IASSD_Head(nn.Module):
    model_cfg: dict
    num_class: int
    predict_boxes_when_training: bool = False

    def setup(self):
        tcfg = self.model_cfg["TARGET_CONFIG"]
        self.box_coder = box_coder_utils.build_box_coder(
            tcfg["BOX_CODER"], **dict(tcfg.get("BOX_CODER_CONFIG", {}))
        )
        use_bn = self.model_cfg.get("USE_BN", True)
        self.cls_center_layers = FCStack(
            tuple(self.model_cfg["CLS_FC"]), self.num_class, use_bn=use_bn
        )
        self.box_center_layers = FCStack(
            tuple(self.model_cfg["REG_FC"]), self.box_coder.code_size,
            use_bn=use_bn,
        )
        if self.model_cfg.get("IOU_FC") is not None:
            self.box_iou3d_layers = FCStack(
                tuple(self.model_cfg["IOU_FC"]), 1, use_bn=use_bn
            )
        else:
            self.box_iou3d_layers = None

    def __call__(self, batch_dict, train: bool = False):
        feats = batch_dict["centers_features"]  # (B, Nc, C)
        centers = batch_dict["centers"]  # (B, Nc, 3)
        valid = batch_dict.get(
            "centers_valid", jnp.ones(centers.shape[:2], bool)
        )
        cls_preds = self.cls_center_layers(feats, train)
        box_preds = self.box_center_layers(feats, train)
        iou_preds = (
            self.box_iou3d_layers(feats, train)
            if self.box_iou3d_layers is not None else None
        )
        batch_dict["center_cls_preds"] = cls_preds
        batch_dict["center_box_preds"] = box_preds
        batch_dict["box_iou3d_preds"] = iou_preds
        batch_dict["point_cls_scores"] = jnp.max(
            jax.nn.sigmoid(cls_preds), axis=-1
        )

        if train:
            batch_dict.update(self.assign_targets(batch_dict))

        point_box_preds = self.box_coder.decode(
            box_preds, centers, jnp.argmax(cls_preds, axis=-1) + 1
        )
        batch_dict["point_box_preds"] = point_box_preds
        if (not train) or self.predict_boxes_when_training:
            batch_dict["batch_cls_preds"] = cls_preds
            batch_dict["batch_box_preds"] = point_box_preds
            batch_dict["cls_preds_normalized"] = False
        return batch_dict

    def assign_targets(self, batch_dict):
        tcfg = self.model_cfg["TARGET_CONFIG"]
        gt = jax.lax.stop_gradient(batch_dict["gt_boxes"])
        if gt.shape[-1] == 10:  # 9-DoF gts: use the 7-DoF part
            gt = jnp.concatenate([gt[..., 0:7], gt[..., -1:]], axis=-1)
        centers = batch_dict["centers"]
        valid = batch_dict.get(
            "centers_valid", jnp.ones(centers.shape[:2], bool)
        )
        ret = {}

        # --- center targets (ignore ring from GT_EXTRA_WIDTH) ----------
        ctr = assign_iassd_targets(
            centers, valid, gt, box_coder=self.box_coder,
            extra_width=tcfg.get("GT_EXTRA_WIDTH"),
            num_class=self.num_class,
            set_ignore_flag=True, ret_box_labels=True,
        )
        ret["center_cls_labels"] = ctr["cls_labels"]
        ret["center_box_labels"] = ctr["box_labels"]
        ret["center_gt_box_of_points"] = ctr["gt_box_of_points"]

        # --- centers_origin targets (extend_gt contextual vote) --------
        extra = tcfg.get("ASSIGN_METHOD", {})
        if extra:
            co = batch_dict["centers_origin"]
            co_valid = jnp.ones(co.shape[:2], bool)
            ex = assign_iassd_targets(
                co, co_valid, gt,
                extra_width=extra.get("EXTRA_WIDTH", [1.0, 1.0, 1.0]),
                num_class=self.num_class,
                use_ex_gt_assign=True,
            )
            ret["center_origin_cls_labels"] = ex["cls_labels"]
            ret["center_origin_box_idxs_of_pts"] = ex["box_idx"]
            ret["gt_box_of_center_origin"] = ex["gt_box_of_points"]

        # --- per-SA instance labels ------------------------------------
        if tcfg.get("INS_AWARE_ASSIGN", False):
            sa_labels, sa_gt_of_points = [], []
            coords_list = batch_dict["encoder_coords"]
            valid_list = batch_dict["encoder_valid"]
            preds_list = batch_dict["sa_ins_preds"]
            for i in range(len(preds_list)):
                if preds_list[i] is None:
                    sa_labels.append(None)
                    sa_gt_of_points.append(None)
                    continue
                # reference: layer 1 uses the tight/ignore assignment,
                # deeper layers the extended one (:283-305)
                deep = len([x for x in sa_labels if x is not None]) >= 1
                sa = assign_iassd_targets(
                    coords_list[i], valid_list[i], gt,
                    extra_width=[0.5, 0.5, 0.5],
                    num_class=self.num_class,
                    use_ex_gt_assign=deep,
                    set_ignore_flag=not deep,
                )
                sa_labels.append(sa["cls_labels"])
                sa_gt_of_points.append(sa["gt_box_of_points"])
            ret["sa_ins_labels"] = sa_labels
            ret["sa_gt_box_of_points"] = sa_gt_of_points
        return ret


def iassd_head_loss(batch_dict, model_cfg, num_class):
    """Full IASSD loss (reference get_loss :402-450)."""
    loss_cfg = model_cfg["LOSS_CONFIG"]
    w = loss_cfg["LOSS_WEIGHTS"]
    tb = {}

    centers = batch_dict["centers"]
    b = centers.shape[0]
    cls_labels = batch_dict["center_cls_labels"]  # (B, Nc)
    pos = cls_labels > 0
    own_gt = batch_dict["center_gt_box_of_points"]  # (B, Nc, 8)

    # ---- contextual vote loss (per-class instance smooth-L1 mean) -----
    co_labels = batch_dict.get("center_origin_cls_labels")
    if co_labels is not None:
        co = batch_dict["centers_origin"]
        offsets = batch_dict["ctr_offsets"]
        pred_ctr = co + offsets
        own = batch_dict["gt_box_of_center_origin"][..., 0:3]
        per_class = []
        for c in range(1, num_class + 1):
            m = (co_labels == c).astype(jnp.float32)
            diff = loss_utils.smooth_l1_loss(
                pred_ctr, own, beta=1.0
            )  # (B, N, 3) smooth-l1 beta=1 (torch default)
            num = jnp.sum(m) * 3
            val = jnp.sum(diff * m[..., None]) / jnp.clip(num, 1.0, None)
            per_class.append((val, jnp.sum(m) > 0))
        vals = jnp.stack([v for v, _ in per_class])
        present = jnp.stack([p for _, p in per_class])
        vote_loss = jnp.sum(
            jnp.where(present, vals, 0.0)
        ) / jnp.clip(jnp.sum(present), 1, None)
        vote_loss = vote_loss * float(w.get("vote_weight", 1.0))
        tb["center_origin_loss_reg"] = vote_loss
    else:
        # center-assign vote loss (reference get_vote_loss_loss)
        co = batch_dict["centers_origin"]
        offsets = batch_dict["ctr_offsets"]
        pred_ctr = co + offsets
        diff = loss_utils.smooth_l1_loss(
            pred_ctr, own_gt[..., 0:3], beta=1.0
        )
        n = jnp.clip(jnp.sum(pos.astype(jnp.float32)) * 3, 1.0, None)
        vote_loss = jnp.sum(diff * pos[..., None]) / n
        tb["vote_loss"] = vote_loss

    # ---- center classification with centerness-scaled targets ---------
    cls_preds = batch_dict["center_cls_preds"]  # (B, Nc, C)
    negs = cls_labels == 0
    cls_w = (pos + negs).astype(jnp.float32)
    cls_w = cls_w / jnp.clip(
        jnp.sum(pos.astype(jnp.float32)), 1.0, None
    )
    one_hot = jax.nn.one_hot(
        jnp.clip(cls_labels, 0, None), num_class + 1
    )[..., 1:]
    if loss_cfg.get("CENTERNESS_REGULARIZATION", False):
        cness = _centerness(
            centers.reshape(-1, 3), own_gt.reshape(-1, own_gt.shape[-1])
        ).reshape(cls_labels.shape)
        cness = jnp.where(pos, cness, 0.0)
        one_hot = one_hot * cness[..., None]
    bce = loss_utils.sigmoid_bce_with_logits(cls_preds, one_hot)
    cls_loss = jnp.sum(
        jnp.mean(bce, axis=-1) * cls_w
    ) * float(w["point_cls_weight"])
    tb["center_loss_cls"] = cls_loss

    # ---- per-SA instance-aware losses ---------------------------------
    sa_loss = 0.0
    sa_labels_list = batch_dict.get("sa_ins_labels")
    if loss_cfg.get("LOSS_INS") is not None and sa_labels_list:
        preds_list = batch_dict["sa_ins_preds"]
        coords_list = batch_dict["encoder_coords"]
        gts_list = batch_dict["sa_gt_box_of_points"]
        ins_w = w.get("ins_aware_weight", [1.0] * len(preds_list))
        method_list = loss_cfg.get("SAMPLE_METHOD_LIST", [])
        count = 0
        total = 0.0
        j = 0
        for i in range(len(preds_list)):
            if preds_list[i] is None or sa_labels_list[i] is None:
                continue
            labels = sa_labels_list[i]
            preds = preds_list[i]
            lpos = labels > 0
            lneg = labels == 0
            lw = (lpos + lneg).astype(jnp.float32)
            lw = lw / jnp.clip(jnp.sum(lpos.astype(jnp.float32)), 1.0, None)
            oh = jax.nn.one_hot(
                jnp.clip(labels, 0, None), num_class + 1
            )[..., 1:]
            is_ctr = False
            if j + 1 < len(method_list):
                is_ctr = "ctr" in str(method_list[j + 1][0])
            if is_ctr:
                cn = _centerness(
                    coords_list[i].reshape(-1, 3),
                    gts_list[i].reshape(-1, gts_list[i].shape[-1]),
                ).reshape(labels.shape)
                oh = oh * jnp.where(lpos, cn, 0.0)[..., None]
            bce_i = loss_utils.sigmoid_bce_with_logits(preds, oh)
            li = jnp.sum(jnp.mean(bce_i, axis=-1) * lw)
            li = li * float(
                ins_w[j] if j < len(ins_w) else 1.0
            )
            tb[f"sa{j}_loss_ins"] = li
            total = total + li
            count += 1
            j += 1
        sa_loss = total / max(count, 1)
        tb["sa_loss_ins"] = sa_loss

    # ---- bin-orientation box loss -------------------------------------
    box_preds = batch_dict["center_box_preds"]
    box_labels = batch_dict["center_box_labels"]
    reg_w = pos.astype(jnp.float32)
    reg_w = reg_w / jnp.clip(jnp.sum(reg_w), 1.0, None)
    coder_bins = model_cfg["TARGET_CONFIG"].get(
        "BOX_CODER_CONFIG", {}
    ).get("angle_bin_num", 12)
    if str(model_cfg["TARGET_CONFIG"]["BOX_CODER"]) == "PointResidualCoder":
        l = loss_utils.smooth_l1_loss(
            box_preds, box_labels, weights=reg_w,
            code_weights=w.get("code_weights"),
        )
        box_loss = jnp.sum(l) * float(w["point_box_weight"])
    else:
        nb = int(coder_bins)
        xyzwhl = loss_utils.smooth_l1_loss(
            box_preds[..., :6], box_labels[..., :6], weights=reg_w
        )
        loss_xyzwhl = jnp.sum(xyzwhl)
        bin_logits = box_preds[..., 6:6 + nb]
        bin_label = box_labels[..., 6].astype(jnp.int32)
        oh_bin = jax.nn.one_hot(jnp.clip(bin_label, 0, nb - 1), nb)
        ce = loss_utils.softmax_cross_entropy(bin_logits, oh_bin)
        loss_bin = jnp.sum(ce * reg_w) * float(w.get("dir_weight", 1.0))
        res_pred = jnp.sum(box_preds[..., 6 + nb:6 + 2 * nb] * oh_bin, -1)
        res_label = box_labels[..., 7]
        # reference quirk (IASSD_head.py:711-713): the residual smooth-
        # L1 is MEANED over ALL centers (bg included) then multiplied
        # by sum(reg_weights)=1 — kept verbatim
        res_l = loss_utils.smooth_l1_loss(
            res_pred[..., None], res_label[..., None], beta=1.0
        )
        loss_res = jnp.mean(res_l) * jnp.sum(reg_w)
        box_loss = (loss_xyzwhl + loss_bin + loss_res) * float(
            w["point_box_weight"]
        )
    tb["center_loss_box"] = box_loss

    # ---- corner loss ---------------------------------------------------
    corner_loss = 0.0
    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        pred_boxes = batch_dict["point_box_preds"]  # (B, Nc, 7+)
        pb = pred_boxes.reshape(-1, pred_boxes.shape[-1])[:, :7]
        gb = own_gt.reshape(-1, own_gt.shape[-1])[:, :7]
        cl = loss_utils.get_corner_loss_lidar(pb, gb)
        pm = pos.reshape(-1)
        corner_loss = jnp.sum(jnp.where(pm, cl, 0.0)) / jnp.clip(
            jnp.sum(pm.astype(jnp.float32)), 1.0, None
        )
        corner_loss = corner_loss * float(w.get("corner_weight", 1.0))
        tb["corner_loss_reg"] = corner_loss

    # ---- IoU3D loss ----------------------------------------------------
    iou_loss = 0.0
    if (
        loss_cfg.get("IOU3D_REGULARIZATION", False)
        and batch_dict.get("box_iou3d_preds") is not None
    ):
        pred_boxes = jax.lax.stop_gradient(
            batch_dict["point_box_preds"]
        ).reshape(-1, batch_dict["point_box_preds"].shape[-1])[:, :7]
        gb = own_gt.reshape(-1, own_gt.shape[-1])[:, :7]
        # paired rotated 3D IoU via the pairwise kernel's diagonal
        # (total center count is small)
        ious = jnp.diagonal(
            iou3d.boxes_iou3d(pred_boxes, gb)
        )
        iou_preds = batch_dict["box_iou3d_preds"].reshape(-1)
        pm = pos.reshape(-1)
        il = loss_utils.smooth_l1_loss(
            iou_preds[..., None], ious[..., None], beta=1.0
        )[..., 0]
        iou_loss = jnp.sum(jnp.where(pm, il, 0.0)) / jnp.clip(
            jnp.sum(pm.astype(jnp.float32)), 1.0, None
        )
        iou_loss = iou_loss * float(w.get("iou3d_weight", 1.0))
        tb["iou3d_loss_reg"] = iou_loss

    total = vote_loss + cls_loss + box_loss + corner_loss + sa_loss + iou_loss
    tb["point_loss"] = total
    return total, tb
