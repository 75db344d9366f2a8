"""Multi-group anchor head (AnchorHeadMulti).

Parity: reference dense_heads/anchor_head_multi.py:373 — an optional
shared conv, then one SingleHead per class group (RPN_HEAD_CFGS), each
with optional per-head conv stack, optional per-component regression
branches (SEPARATE_REG_CONFIG), class/dir heads; predictions concat
along the anchor axis; losses are the shared anchor losses with
optional pos/neg classification weighting.

TPU-first deviations (documented):
- predictions and anchors use the same spatial-major per-head layout
  as AnchorHeadSingle, concatenated head-by-head (the reference's
  USE_MULTIHEAD anchor-major permutation is an internal layout choice;
  consistency between preds, anchors and targets is what matters).
- separate_multihead=False semantics (each head predicts the full
  class vector; heads' slices concat) — the variant every shipped
  OpenPCDet multihead config uses with MULTI_CLASSES_NMS handled in
  post-processing.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import DENSE_HEADS
from ...utils import box_coder_utils
from . import anchor_generator
from .anchor_head import AnchorHeadSingle
from .atss_assigner import assign_targets_atss
from .axis_aligned_assigner import (
    assign_targets, assign_targets_windowed, choose_window_cells,
)
from ..model_utils import dtype_utils


class _ConvBNReLU(nn.Module):
    channels: int
    kernel: int = 3
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        p = self.kernel // 2
        x = nn.Conv(
            self.channels, (self.kernel, self.kernel),
            padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class SingleHead(nn.Module):
    """One class-group head (reference SingleHead)."""

    model_cfg: dict
    num_class: int
    num_anchors_per_location: int
    code_size: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        sep = self.model_cfg.get("SEPARATE_REG_CONFIG")
        a_loc = self.num_anchors_per_location
        b = x.shape[0]
        pi_bias = nn.initializers.constant(-np.log((1 - 0.01) / 0.01))

        if sep is not None:
            n_mid = int(sep["NUM_MIDDLE_CONV"])
            n_filt = int(sep["NUM_MIDDLE_FILTER"])
            # classification branch
            c = x
            for _ in range(n_mid):
                c = _ConvBNReLU(n_filt, dtype=self.dtype)(c, train)
            cls_preds = nn.Conv(
                a_loc * self.num_class, (3, 3), padding="SAME",
                bias_init=pi_bias, dtype=self.dtype,
            )(c)
            # per-component regression branches
            reg_outs = []
            for reg_cfg in sep["REG_LIST"]:
                name, ch = str(reg_cfg).split(":")
                r = x
                for _ in range(n_mid):
                    r = _ConvBNReLU(n_filt, dtype=self.dtype)(r, train)
                reg_outs.append(nn.Conv(
                    a_loc * int(ch), (3, 3), padding="SAME",
                    kernel_init=nn.initializers.normal(0.001),
                    dtype=self.dtype,
                )(r))
            # concat per-anchor code components: reshape each to
            # (..., a_loc, ch) first so codes interleave per anchor
            parts = [
                r.reshape(r.shape[:3] + (a_loc, -1)) for r in reg_outs
            ]
            box_preds = jnp.concatenate(parts, axis=-1)
            assert box_preds.shape[-1] == self.code_size, (
                f"code size mismatch {box_preds.shape[-1]} "
                f"vs {self.code_size}"
            )
        else:
            cls_preds = nn.Conv(
                a_loc * self.num_class, (1, 1), bias_init=pi_bias,
                dtype=self.dtype,
            )(x)
            box_preds = nn.Conv(
                a_loc * self.code_size, (1, 1),
                kernel_init=nn.initializers.normal(0.001),
                dtype=self.dtype,
            )(x).reshape(x.shape[:3] + (a_loc, self.code_size))

        dir_preds = None
        if self.model_cfg.get("USE_DIRECTION_CLASSIFIER", False):
            nbins = int(self.model_cfg["NUM_DIR_BINS"])
            dir_preds = nn.Conv(
                a_loc * nbins, (1, 1), dtype=self.dtype
            )(x).astype(jnp.float32).reshape(b, -1, nbins)

        cls_preds = cls_preds.astype(jnp.float32).reshape(
            b, -1, self.num_class
        )
        box_preds = box_preds.astype(jnp.float32).reshape(
            b, -1, self.code_size
        )
        return cls_preds, box_preds, dir_preds


@DENSE_HEADS.register
class AnchorHeadMulti(nn.Module):
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
        gen_cfg = list(self.model_cfg["ANCHOR_GENERATOR_CONFIG"])
        by_class = {c["class_name"]: c for c in gen_cfg}

        heads = []
        anchors_list, groups_list = [], []
        matched_list, unmatched_list = [], []
        dt = dtype_utils.compute_dtype(self.model_cfg)
        for head_cfg in self.model_cfg["RPN_HEAD_CFGS"]:
            names = list(head_cfg["HEAD_CLS_NAME"])
            sub_cfg = [by_class[n] for n in names]
            (
                anchors, groups, matched, unmatched, a_loc,
            ) = anchor_generator.generate_anchors(
                sub_cfg, self.grid_size, self.point_cloud_range
            )
            # remap group ids (local cfg index) → global class index
            local_to_global = np.array(
                [self.class_names.index(n) for n in names], np.int32
            )
            ny, nx = anchors.shape[0], anchors.shape[1]
            anchors_list.append(anchors.reshape(-1, anchors.shape[-1]))
            groups_list.append(
                np.tile(local_to_global[groups], ny * nx)
            )
            matched_list.append(np.tile(matched, ny * nx))
            unmatched_list.append(np.tile(unmatched, ny * nx))
            heads.append(SingleHead(
                model_cfg=self.model_cfg,
                num_class=self.num_class,
                num_anchors_per_location=a_loc,
                code_size=self.box_coder.code_size,
                dtype=dt,
            ))
        self.rpn_heads = heads
        self._anchors_np = np.concatenate(anchors_list, axis=0)
        self._groups_np = np.concatenate(groups_list)
        self._matched_np = np.concatenate(matched_list)
        self._unmatched_np = np.concatenate(unmatched_list)
        # per-head grid-shaped data for the windowed fast path (classes
        # partition across heads, so dense assignment — incl. the per-gt
        # force-match maxima, which only range over same-class anchors —
        # is separable per head)
        head_grids = []
        for head_cfg in self.model_cfg["RPN_HEAD_CFGS"]:
            names = list(head_cfg["HEAD_CLS_NAME"])
            sub_cfg = [by_class[n] for n in names]
            (
                anchors, groups, matched, unmatched, _,
            ) = anchor_generator.generate_anchors(
                sub_cfg, self.grid_size, self.point_cloud_range
            )
            local_to_global = np.array(
                [self.class_names.index(n) for n in names], np.int32
            )
            w = int(tgt_cfg.get(
                "WINDOW_CELLS", choose_window_cells(anchors)
            ))
            if not (w <= anchors.shape[1] and w <= anchors.shape[0]):
                w = 0
            head_grids.append(
                (anchors, local_to_global[groups], matched, unmatched, w)
            )
        self._head_grids = head_grids

        if self.model_cfg.get("SHARED_CONV_NUM_FILTER") is not None:
            self.shared_conv = _ConvBNReLU(
                int(self.model_cfg["SHARED_CONV_NUM_FILTER"]), dtype=dt
            )
        else:
            self.shared_conv = None

    def __call__(self, batch_dict, train: bool = False):
        x = batch_dict["spatial_features_2d"]
        if self.shared_conv is not None:
            x = self.shared_conv(x, train)

        cls_list, box_list, dir_list = [], [], []
        for head in self.rpn_heads:
            c, bx, d = head(x, train)
            cls_list.append(c)
            box_list.append(bx)
            dir_list.append(d)
        cls_preds = jnp.concatenate(cls_list, axis=1)
        box_preds = jnp.concatenate(box_list, axis=1)
        dir_preds = (
            jnp.concatenate(dir_list, axis=1)
            if dir_list[0] is not None else None
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
                tdict = assign_targets_atss(
                    anchors, gt,
                    topk=int(tgt_cfg.get("TOPK", 9)),
                    box_coder=self.box_coder,
                    match_height=bool(tgt_cfg.get("MATCH_HEIGHT", False)),
                )
            elif (
                tgt_cfg.get(
                    "WINDOWED_ASSIGN", jax.default_backend() != "tpu"
                )
                and all(g[4] for g in self._head_grids)
            ):
                parts = [
                    assign_targets_windowed(
                        jnp.asarray(a_grid),
                        jnp.asarray(g_loc),
                        jnp.asarray(m_loc),
                        jnp.asarray(u_loc),
                        gt,
                        box_coder=self.box_coder,
                        match_height=bool(
                            tgt_cfg.get("MATCH_HEIGHT", False)
                        ),
                        window=w,
                        method=str(tgt_cfg.get("WINDOW_METHOD", "loop")),
                    )
                    for a_grid, g_loc, m_loc, u_loc, w in self._head_grids
                ]
                tdict = {
                    k: jnp.concatenate([p[k] for p in parts], axis=1)
                    for k in parts[0]
                }
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
        return batch_dict

    generate_predicted_boxes = AnchorHeadSingle.generate_predicted_boxes
    _dir_cfg = AnchorHeadSingle._dir_cfg
