"""Anchor-based dense head (AnchorHeadSingle) + functional losses.

Parity: reference AnchorHeadTemplate / AnchorHeadSingle
(dense_heads/anchor_head_template.py:11-275, anchor_head_single.py:75):
1×1 conv cls/box/dir heads on the BEV features, axis-aligned IoU
target assignment, focal cls + (sin-difference) smooth-L1 reg +
direction-bin CE losses, residual box decode with direction-bin yaw
correction.

The flax module computes predictions and (in training) targets; the
loss itself is the pure function ``anchor_head_loss`` so the train
step can call it on the returned batch_dict.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DENSE_HEADS
from ...utils import box_coder_utils, loss_utils
from ...ops import geometry
from . import anchor_generator
from .axis_aligned_assigner import (
    assign_targets, assign_targets_windowed, choose_window_cells,
)
from ..model_utils import dtype_utils


def add_sin_difference(preds, targets, dim: int = 6):
    """sin(a-b) decomposition on the yaw code (reference
    anchor_head_template.py add_sin_difference:143)."""
    rad_p = jnp.sin(preds[..., dim : dim + 1]) * jnp.cos(
        targets[..., dim : dim + 1]
    )
    rad_t = jnp.cos(preds[..., dim : dim + 1]) * jnp.sin(
        targets[..., dim : dim + 1]
    )
    p = jnp.concatenate(
        [preds[..., :dim], rad_p, preds[..., dim + 1 :]], axis=-1
    )
    t = jnp.concatenate(
        [targets[..., :dim], rad_t, targets[..., dim + 1 :]], axis=-1
    )
    return p, t


def decode_boxes_with_dir(coder, dir_cfg, box_preds, dir_preds, anchors):
    """Residual decode + direction-bin yaw correction on matching
    (..., S) / (..., 7+) shapes (reference generate_predicted_boxes
    :228-275). Free function so post_processing can decode only the
    gathered top-`pre` candidate rows (see `lazy_box_decode`)."""
    batch_box = coder.decode(box_preds, anchors)
    if dir_preds is not None and dir_cfg is not None:
        dir_offset, dir_limit, num_bins = dir_cfg
        dir_labels = jnp.argmax(dir_preds, axis=-1)
        period = 2 * jnp.pi / num_bins
        yaw = geometry.limit_period(
            batch_box[..., 6] - dir_offset, dir_limit, period
        )
        yaw = yaw + dir_offset + period * dir_labels.astype(yaw.dtype)
        batch_box = batch_box.at[..., 6].set(yaw)
    return batch_box


def get_direction_target(anchors, reg_targets, dir_offset: float,
                         num_bins: int):
    """(B, A, 7+) anchors + reg targets → (B, A) dir bin ids
    (reference get_direction_target :148-160)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = rot_gt - dir_offset
    offset_rot = offset_rot - jnp.floor(offset_rot / (2 * jnp.pi)) * (
        2 * jnp.pi
    )
    bins = jnp.floor(offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(bins, 0, num_bins - 1)


@DENSE_HEADS.register
class AnchorHeadSingle(nn.Module):
    model_cfg: dict
    num_class: int
    class_names: tuple
    grid_size: tuple
    point_cloud_range: tuple
    predict_boxes_when_training: bool = False

    def setup(self):
        tgt_cfg = self.model_cfg["TARGET_ASSIGNER_CONFIG"]
        coder_cfg = dict(tgt_cfg.get("BOX_CODER_CONFIG", {}))
        self.box_coder = box_coder_utils.build_box_coder(
            tgt_cfg["BOX_CODER"], **coder_cfg
        )
        (
            anchors,
            groups,
            matched,
            unmatched,
            self.num_anchors_per_location,
        ) = anchor_generator.generate_anchors(
            self.model_cfg["ANCHOR_GENERATOR_CONFIG"],
            self.grid_size,
            self.point_cloud_range,
        )
        ny, nx = anchors.shape[0], anchors.shape[1]
        self._anchors_grid_np = anchors  # (ny, nx, A_loc, 7)
        self._anchors_np = anchors.reshape(-1, anchors.shape[-1])
        self._groups_np = np.tile(groups, ny * nx)
        self._matched_np = np.tile(matched, ny * nx)
        self._unmatched_np = np.tile(unmatched, ny * nx)
        self._groups_loc_np = groups
        self._matched_loc_np = matched
        self._unmatched_loc_np = unmatched
        w = int(tgt_cfg.get("WINDOW_CELLS", choose_window_cells(anchors)))
        self._assign_window = w if (w <= nx and w <= ny) else 0

        a_loc = self.num_anchors_per_location
        dt = dtype_utils.compute_dtype(self.model_cfg)
        self.conv_cls = nn.Conv(
            a_loc * self.num_class, (1, 1),
            bias_init=nn.initializers.constant(-np.log((1 - 0.01) / 0.01)),
            dtype=dt,
        )
        self.conv_box = nn.Conv(
            a_loc * self.box_coder.code_size, (1, 1),
            kernel_init=nn.initializers.normal(0.001), dtype=dt,
        )
        self.use_dir = self.model_cfg.get("USE_DIRECTION_CLASSIFIER", False)
        if self.use_dir:
            self.conv_dir = nn.Conv(
                a_loc * int(self.model_cfg["NUM_DIR_BINS"]), (1, 1), dtype=dt
            )

    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features_2d"]  # (B, H, W, C)
        b = x.shape[0]
        # raw predictions go back to fp32 for decode / losses / NMS
        cls_preds = self.conv_cls(x).astype(jnp.float32).reshape(
            b, -1, self.num_class
        )
        box_preds = self.conv_box(x).astype(jnp.float32).reshape(
            b, -1, self.box_coder.code_size
        )
        dir_preds = None
        if self.use_dir:
            dir_preds = self.conv_dir(x).astype(jnp.float32).reshape(
                b, -1, int(self.model_cfg["NUM_DIR_BINS"])
            )

        anchors = jnp.asarray(self._anchors_np)
        batch_dict["cls_preds"] = cls_preds
        batch_dict["box_preds"] = box_preds
        batch_dict["dir_cls_preds"] = dir_preds
        batch_dict["anchors"] = anchors

        if train:
            tgt_cfg = self.model_cfg["TARGET_ASSIGNER_CONFIG"]
            gt = jax.lax.stop_gradient(batch_dict["gt_boxes"])
            if str(tgt_cfg.get("NAME")) == "ATSSTargetAssigner":
                from .atss_assigner import assign_targets_atss

                tdict = assign_targets_atss(
                    anchors, gt,
                    topk=int(tgt_cfg.get("TOPK", 9)),
                    box_coder=self.box_coder,
                    match_height=bool(tgt_cfg.get("MATCH_HEIGHT", False)),
                )
            elif self._assign_window and tgt_cfg.get(
                "WINDOWED_ASSIGN", jax.default_backend() != "tpu"
            ):
                # exact fast path: windowed IoU around each gt instead
                # of the dense (A, M) matrix (bit-equal, tested)
                tdict = assign_targets_windowed(
                    jnp.asarray(self._anchors_grid_np),
                    jnp.asarray(self._groups_loc_np),
                    jnp.asarray(self._matched_loc_np),
                    jnp.asarray(self._unmatched_loc_np),
                    gt,
                    box_coder=self.box_coder,
                    match_height=bool(tgt_cfg.get("MATCH_HEIGHT", False)),
                    window=self._assign_window,
                    method=str(tgt_cfg.get("WINDOW_METHOD", "loop")),
                )
            else:
                tdict = assign_targets(
                    anchors,
                    jnp.asarray(self._groups_np),
                    jnp.asarray(self._matched_np),
                    jnp.asarray(self._unmatched_np),
                    gt,
                    box_coder=self.box_coder,
                    match_height=bool(tgt_cfg.get("MATCH_HEIGHT", False)),
                )
            batch_dict.update(tdict)

        if (not train) or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(
                cls_preds, box_preds, dir_preds, anchors
            )
            batch_dict["batch_cls_preds"] = batch_cls
            batch_dict["batch_box_preds"] = batch_box
            batch_dict["cls_preds_normalized"] = False
            if not self.predict_boxes_when_training:
                # no downstream module consumes the fully-decoded
                # boxes: hand post_processing the raw ingredients so it
                # can decode only the top-`pre` candidates (321k-anchor
                # decode = 1.2 ms/scan on v5e, measured; XLA then DCEs
                # batch_box_preds when unused). Arrays are CELL-shaped
                # (B, H*W, A_loc*C): gathering full 42-wide cell rows
                # and one-hot-selecting the anchor sub-block measured
                # ~4.5x faster than row-gathering the (B, A, 7) view —
                # 7-wide minor dims waste 121/128 TPU lanes. Detectors
                # with RoI/point heads never set this (they rewrite
                # batch_box_preds downstream).
                b2, h2, w2 = x.shape[0], x.shape[1], x.shape[2]
                a_loc = self.num_anchors_per_location
                batch_dict["lazy_box_decode"] = {
                    "raw_cell": box_preds.reshape(b2, h2 * w2, -1),
                    "dir_cell": (
                        dir_preds.reshape(b2, h2 * w2, -1)
                        if dir_preds is not None else None
                    ),
                    "anchors_cell": anchors.reshape(h2 * w2, -1),
                    "a_loc": a_loc,
                    "code_size": self.box_coder.code_size,
                    "coder": self.box_coder,
                    "dir_cfg": self._dir_cfg(),
                }
        return batch_dict

    def _dir_cfg(self):
        # read the config key, not self.use_dir: AnchorHeadMulti
        # borrows this method and has no use_dir attribute
        if not self.model_cfg.get("USE_DIRECTION_CLASSIFIER", False):
            return None
        return (
            float(self.model_cfg.get("DIR_OFFSET", 0.78539)),
            float(self.model_cfg.get("DIR_LIMIT_OFFSET", 0.0)),
            int(self.model_cfg["NUM_DIR_BINS"]),
        )

    def generate_predicted_boxes(self, cls_preds, box_preds, dir_preds,
                                 anchors):
        """Decode + direction-bin yaw correction (reference
        generate_predicted_boxes :228-275)."""
        return cls_preds, decode_boxes_with_dir(
            self.box_coder, self._dir_cfg(), box_preds, dir_preds,
            anchors[None],
        )


def anchor_head_loss(batch_dict, loss_cfg, num_class: int,
                     dir_cfg: dict | None = None):
    """Pure loss: focal cls + sin-diff smooth-L1 + dir CE (reference
    get_cls_layer_loss :104-138 / get_box_reg_layer_loss :162-216).

    Returns (total, tb_dict of scalars)."""
    cls_preds = batch_dict["cls_preds"]
    box_preds = batch_dict["box_preds"]
    dir_preds = batch_dict.get("dir_cls_preds")
    labels = batch_dict["box_cls_labels"]  # (B, A)
    reg_targets = batch_dict["box_reg_targets"]
    anchors = batch_dict["anchors"]  # (A, 7)
    b = cls_preds.shape[0]
    weights = loss_cfg["LOSS_WEIGHTS"]

    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    pos_w = float(weights.get("pos_cls_weight", 1.0))
    neg_w = float(weights.get("neg_cls_weight", 1.0))
    cls_weights = (
        neg_w * negatives + pos_w * positives
    ).astype(jnp.float32)
    reg_weights = positives.astype(jnp.float32)
    pos_norm = jnp.clip(
        jnp.sum(positives, axis=1, keepdims=True).astype(jnp.float32), 1.0, None
    )
    cls_weights = cls_weights / pos_norm
    reg_weights = reg_weights / pos_norm

    cls_targets = jnp.where(cared, labels, 0)
    if num_class == 1:
        cls_targets = jnp.where(positives, 1, cls_targets)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_loss(
        cls_preds, one_hot, weights=cls_weights
    )
    cls_loss = jnp.sum(cls_loss) / b * float(weights["cls_weight"])

    preds_sin, targets_sin = add_sin_difference(box_preds, reg_targets)
    loc_loss = loss_utils.smooth_l1_loss(
        preds_sin, targets_sin, weights=reg_weights,
        code_weights=weights["code_weights"],
    )
    loc_loss = jnp.sum(loc_loss) / b * float(weights["loc_weight"])

    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
    total = cls_loss + loc_loss

    if dir_preds is not None and dir_cfg is not None:
        dir_targets = get_direction_target(
            anchors[None], reg_targets,
            dir_offset=float(dir_cfg.get("DIR_OFFSET", 0.78539)),
            num_bins=int(dir_cfg["NUM_DIR_BINS"]),
        )
        dir_onehot = jax.nn.one_hot(dir_targets, int(dir_cfg["NUM_DIR_BINS"]))
        w = positives.astype(jnp.float32)
        w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1.0, None)
        dir_loss = loss_utils.softmax_cross_entropy(
            dir_preds, dir_onehot, weights=w
        )
        dir_loss = jnp.sum(dir_loss) / b * float(weights["dir_weight"])
        total = total + dir_loss
        tb["rpn_loss_dir"] = dir_loss

    tb["rpn_loss"] = total
    return total, tb
