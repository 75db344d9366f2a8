"""Detector composition spine + shared post-processing.

Parity: reference Detector3DTemplate
(models/detectors/detector3d_template.py:14-328): the detector is a
sequence of module slots
VFE → BACKBONE_3D → MAP_TO_BEV → PFE → BACKBONE_2D → DENSE_HEAD →
POINT_HEAD → ROI_HEAD, each reading/writing a shared batch_dict, plus
a shared per-sample NMS post-processing (:178-284).

TPU-first deviations:
- batch_dict is a plain dict of fixed-shape arrays; validity is carried
  by masks/counts, never by ragged shapes.
- voxelization runs ON DEVICE as a fused preprocessing step at the top
  of the forward pass (vmapped ops.voxelize), replacing the reference's
  CPU spconv voxel generator in the dataloader worker
  (datasets/processor/data_processor.py:15-60). The input pipeline
  only ships padded (B, N, 4+) point tensors.
- post_processing returns fixed-size (B, post_max) buffers + counts.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import (
    BACKBONES_2D, BACKBONES_3D, DENSE_HEADS, MAP_TO_BEV, PFE, POINT_HEADS,
    ROI_HEADS, VFE,
)
from ...ops import nms as nms_ops
from ...ops import voxelize as voxelize_ops
from ...ops import iou3d


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Static dataset facts the model needs (shapes, ranges)."""

    class_names: tuple
    point_feature_dim: int  # channels per point incl. xyz
    point_cloud_range: tuple  # (x0, y0, z0, x1, y1, z1)
    voxel_size: tuple = (0.16, 0.16, 4.0)
    max_voxels: int = 16000
    max_points_per_voxel: int = 32
    depth_downsample_factor: int = 1

    @property
    def grid_size(self):
        pc = self.point_cloud_range
        vs = self.voxel_size
        return (
            int(round((pc[3] - pc[0]) / vs[0])),
            int(round((pc[4] - pc[1]) / vs[1])),
            int(round((pc[5] - pc[2]) / vs[2])),
        )


class Detector3DTemplate(nn.Module):
    model_cfg: dict
    num_class: int
    dataset: object  # DatasetSpec or dataset exposing .spec

    @property
    def spec(self) -> DatasetSpec:
        return self.dataset if isinstance(self.dataset, DatasetSpec) else self.dataset.spec

    def setup(self):
        spec = self.spec
        modules = []
        cfg = self.model_cfg

        if "VFE" in cfg:
            vfe_cls = VFE.get(cfg["VFE"]["NAME"])
            if vfe_cls.__name__ == "ImageVFE":
                extra = dict(
                    grid_size=spec.grid_size,
                    point_cloud_range=spec.point_cloud_range,
                    depth_downsample_factor=spec.depth_downsample_factor,
                )
            elif vfe_cls.__name__ in ("PillarVFE", "DynamicPillarVFE"):
                extra = dict(
                    voxel_size=spec.voxel_size,
                    point_cloud_range=spec.point_cloud_range,
                )
            else:
                extra = {}
            self.vfe = vfe_cls(
                model_cfg=cfg["VFE"],
                num_point_features=spec.point_feature_dim,
                **extra,
            )
            modules.append(self.vfe)

        if "BACKBONE_3D" in cfg:
            bb_cls = BACKBONES_3D.get(cfg["BACKBONE_3D"]["NAME"])
            bb_extra = (
                dict(num_class=self.num_class)
                if bb_cls.__name__ == "IASSD_Backbone" else {}
            )
            # point backbones take the pc range for the binned query
            if "point_cloud_range" in bb_cls.__dataclass_fields__:
                bb_extra["point_cloud_range"] = tuple(
                    spec.point_cloud_range
                )
            self.backbone_3d = bb_cls(
                model_cfg=cfg["BACKBONE_3D"],
                input_channels=self.vfe.output_feature_dim if "VFE" in cfg else spec.point_feature_dim,
                grid_size=spec.grid_size,
                **bb_extra,
            )
            modules.append(self.backbone_3d)

        if "MAP_TO_BEV" in cfg:
            self.map_to_bev = MAP_TO_BEV.get(cfg["MAP_TO_BEV"]["NAME"])(
                model_cfg=cfg["MAP_TO_BEV"], grid_size=spec.grid_size
            )
            modules.append(self.map_to_bev)

        if "PFE" in cfg:
            self.pfe = PFE.get(cfg["PFE"]["NAME"])(
                model_cfg=cfg["PFE"],
                voxel_size=spec.voxel_size,
                point_cloud_range=spec.point_cloud_range,
            )
            modules.append(self.pfe)

        if "BACKBONE_2D" in cfg:
            self.backbone_2d = BACKBONES_2D.get(cfg["BACKBONE_2D"]["NAME"])(
                model_cfg=cfg["BACKBONE_2D"],
                input_channels=self.map_to_bev.num_bev_features
                if "MAP_TO_BEV" in cfg else 0,
            )
            modules.append(self.backbone_2d)

        if "DENSE_HEAD" in cfg:
            self.dense_head = DENSE_HEADS.get(cfg["DENSE_HEAD"]["NAME"])(
                model_cfg=cfg["DENSE_HEAD"],
                num_class=self.num_class
                if not cfg["DENSE_HEAD"].get("CLASS_AGNOSTIC", False) else 1,
                class_names=tuple(spec.class_names),
                grid_size=spec.grid_size,
                point_cloud_range=tuple(spec.point_cloud_range),
                predict_boxes_when_training=("ROI_HEAD" in cfg),
            )
            modules.append(self.dense_head)

        if "POINT_HEAD" in cfg:
            self.point_head = POINT_HEADS.get(cfg["POINT_HEAD"]["NAME"])(
                model_cfg=cfg["POINT_HEAD"],
                num_class=self.num_class
                if not cfg["POINT_HEAD"].get("CLASS_AGNOSTIC", False) else 1,
                predict_boxes_when_training=("ROI_HEAD" in cfg),
            )
            modules.append(self.point_head)

        if "ROI_HEAD" in cfg:
            roi_cls = ROI_HEADS.get(cfg["ROI_HEAD"]["NAME"])
            extra = (
                dict(
                    point_cloud_range=tuple(spec.point_cloud_range),
                    voxel_size=tuple(spec.voxel_size),
                )
                if roi_cls.__name__ == "SECONDHead"
                else {}
            )
            roi_num_class = (
                1 if cfg["ROI_HEAD"].get("CLASS_AGNOSTIC", False)
                else self.num_class
            )
            self.roi_head = roi_cls(
                model_cfg=cfg["ROI_HEAD"], num_class=roi_num_class, **extra
            )
            modules.append(self.roi_head)

        self.module_list = modules

    # ------------------------------------------------------------------
    # fused on-device preprocessing
    # ------------------------------------------------------------------
    def maybe_voxelize(self, batch_dict):
        """Device voxelization of padded (B, N, C) points, if the model
        consumes voxels/pillars and the pipeline didn't provide them."""
        if (
            "voxels" in batch_dict
            or "VFE" not in self.model_cfg
            or "points" not in batch_dict  # camera-only path (CaDDN)
        ):
            return batch_dict
        spec = self.spec
        points = batch_dict["points"]
        mask = batch_dict.get(
            "points_mask",
            jnp.any(points[..., :3] != 0, axis=-1),
        )

        def vox_one(p, m):
            return voxelize_ops.voxelize(
                p, m,
                tuple(spec.point_cloud_range), tuple(spec.voxel_size),
                spec.max_voxels, spec.max_points_per_voxel,
            )

        out = jax.vmap(vox_one)(points, mask)
        batch_dict.update(
            voxels=out["voxels"],
            voxel_coords=out["voxel_coords"],
            voxel_num_points=out["voxel_num_points"],
            point_voxel_idx=out["point_voxel_idx"],
            # sorted-order metadata: enables the fused (no-voxel-buffer)
            # VFE paths and the gather-based BEV canvas; unused keys
            # are dead-code-eliminated by XLA
            order=out["order"],
            sorted_slot=out["sorted_slot"],
            sorted_rank=out["sorted_rank"],
            voxel_starts=out["voxel_starts"],
        )
        batch_dict["voxel_coords_sorted"] = True
        # static python int: the per-voxel point cap, for windowed
        # segmented reductions in fused VFE paths
        batch_dict["_points_per_voxel_cap"] = spec.max_points_per_voxel
        return batch_dict

    def apply_modules(self, batch_dict, train: bool):
        spec = self.spec
        batch_dict.setdefault(
            "voxel_size_xyz", jnp.asarray(spec.voxel_size, jnp.float32)
        )
        batch_dict.setdefault(
            "pc_range_min",
            jnp.asarray(spec.point_cloud_range[:3], jnp.float32),
        )
        batch_dict = self.maybe_voxelize(batch_dict)
        for m in self.module_list:
            batch_dict = m(batch_dict, train=train)
        return batch_dict

    def __call__(self, batch_dict, train: bool = False):
        return self.apply_modules(batch_dict, train)


# ---------------------------------------------------------------------------
# shared post-processing (pure function)
# ---------------------------------------------------------------------------

def post_processing(batch_dict, post_cfg, num_class: int):
    """Per-sample NMS (reference detector3d_template.post_processing
    :178-284, class-agnostic path) with fixed-size outputs.

    Returns dict with (B, post_max) arrays: boxes (.., 7+), scores,
    labels (1-based), and counts (B,).
    """
    cls_preds = batch_dict["batch_cls_preds"]  # (B, A, nc)
    box_preds = batch_dict["batch_box_preds"]  # (B, A, 7+)
    normalized = batch_dict.get("cls_preds_normalized", False)
    if not normalized:
        cls_preds = jax.nn.sigmoid(cls_preds)
    nms_cfg = post_cfg["NMS_CONFIG"]
    score_thresh = float(post_cfg.get("SCORE_THRESH", 0.1))
    iou_kind = (
        "aligned"
        if "normal" in str(nms_cfg.get("NMS_TYPE", "nms_gpu"))
        else "rotated"
    )

    # batched candidate selection OUTSIDE the per-sample map: one
    # (B, A) lax.top_k instead of B sequential 321k-element top_k's
    # inside lax.map (~0.9 ms/sample on v5e)
    scores = jnp.max(cls_preds, axis=-1)  # (B, A)
    labels = jnp.argmax(cls_preds, axis=-1) + 1  # (B, A)
    masked = jnp.where(scores >= score_thresh, scores, nms_ops.NEG_INF)
    pre = min(int(nms_cfg["NMS_PRE_MAXSIZE"]), scores.shape[1])
    lazy = batch_dict.get("lazy_box_decode")
    a_loc_ts = int(lazy["a_loc"]) if lazy is not None else 0
    if a_loc_ts and masked.shape[1] >= 4 * pre * a_loc_ts:
        # exact two-stage top-k (cell-max prune + two-key sort),
        # bit-identical to lax.top_k incl. tie order — sorts 53k+24k
        # elements instead of 321k at KITTI PointPillars scale
        top_scores, order = nms_ops.top_k_two_stage(masked, pre, a_loc_ts)
    elif masked.shape[0] == 1:
        # XLA's TPU windowed-sort lowering CHECK-fails on a (1, A)
        # batched top_k (fusion_util TransformWindow, observed on
        # f32[1,321408]); the 1-D form compiles fine
        ts1, o1 = jax.lax.top_k(masked[0], pre)
        top_scores, order = ts1[None], o1[None]
    else:
        top_scores, order = jax.lax.top_k(masked, pre)  # (B, P)
    if lazy is not None:
        # decode only the gathered candidates: same elementwise math as
        # the head's full decode, on P instead of A rows (~78x less at
        # KITTI PointPillars scale); the unused batch_box_preds is
        # DCE'd. Gather at CELL granularity — full (A_loc*C)-wide conv
        # rows, then a one-hot select of the candidate's anchor slot —
        # which measured ~4.5x faster on v5e than row-gathering the
        # narrow (B, A, 7) view (7-wide minor dims run at 7/128 lane
        # occupancy on TPU).
        from ..dense_heads.anchor_head import decode_boxes_with_dir

        a_loc = int(lazy["a_loc"])
        cell = order // a_loc  # (B, P)
        sub = order % a_loc
        onehot = (
            sub[..., None] == jnp.arange(a_loc, dtype=sub.dtype)
        )  # (B, P, A_loc)

        def cell_select(arr_cell, width):
            rows = jnp.take_along_axis(
                arr_cell, cell[..., None], axis=1
            )  # (B, P, A_loc*width)
            r = rows.reshape(rows.shape[0], rows.shape[1], a_loc, width)
            return jnp.einsum(
                "bpa,bpac->bpc", onehot.astype(r.dtype), r
            )

        code = int(lazy["code_size"])
        raw_rows = cell_select(lazy["raw_cell"], code)
        dir_rows = None
        if lazy["dir_cell"] is not None:
            nb = lazy["dir_cell"].shape[-1] // a_loc
            dir_rows = cell_select(lazy["dir_cell"], nb)
        anch_rows = jnp.take(lazy["anchors_cell"], cell, axis=0)
        anch_rows = jnp.einsum(
            "bpa,bpac->bpc",
            onehot.astype(anch_rows.dtype),
            anch_rows.reshape(
                anch_rows.shape[0], anch_rows.shape[1], a_loc, -1
            ),
        )
        cand_boxes = decode_boxes_with_dir(
            lazy["coder"], lazy["dir_cfg"], raw_rows, dir_rows, anch_rows
        )
    else:
        cand_boxes = jnp.take_along_axis(
            box_preds, order[..., None], axis=1
        )  # (B, P, 7+)
    cand_labels = jnp.take_along_axis(labels, order, axis=1)

    # batched NMS: one fused Pallas launch for the whole batch on TPU
    # (mask + greedy resolve in-kernel, no HBM mask); per-sample
    # mask+resolve fallback elsewhere — identical greedy semantics
    sel, counts = nms_ops.nms_candidates_batched(
        cand_boxes,
        top_scores,
        thresh=float(nms_cfg["NMS_THRESH"]),
        post_maxsize=int(nms_cfg["NMS_POST_MAXSIZE"]),
        iou_kind=iou_kind,
    )
    post = sel.shape[1]
    in_count = jnp.arange(post)[None, :] < counts[:, None]  # (B, post)
    sel_boxes = jnp.take_along_axis(cand_boxes, sel[..., None], axis=1)
    sel_scores = jnp.take_along_axis(top_scores, sel, axis=1)
    sel_labels = jnp.take_along_axis(cand_labels, sel, axis=1)
    return {
        "pred_boxes": jnp.where(in_count[..., None], sel_boxes, 0.0),
        "pred_scores": jnp.where(in_count, sel_scores, 0.0),
        "pred_labels": jnp.where(in_count, sel_labels, 0).astype(jnp.int32),
        "pred_count": counts,
    }


def generate_recall_record(batch_dict, pred_boxes, pred_counts,
                           thresh_list=(0.3, 0.5, 0.7)):
    """Recall counters vs gt (reference generate_recall_record
    :286-328): for each IoU threshold count gts whose best-matching
    final box exceeds it. Returns dict of scalars (summed over batch).
    """
    gt = batch_dict["gt_boxes"]  # (B, M, 7+1+)

    def single(gt_b, boxes_b, count_b):
        gt_valid = jnp.any(jnp.abs(gt_b[:, :7]) > 0, axis=-1)
        box_valid = jnp.arange(boxes_b.shape[0]) < count_b
        iou = iou3d.boxes_iou3d(gt_b[:, :7], boxes_b[:, :7])
        iou = jnp.where(
            gt_valid[:, None] & box_valid[None, :], iou, 0.0
        )
        best = jnp.max(iou, axis=1)
        out = {"gt": jnp.sum(gt_valid)}
        for t in thresh_list:
            out[f"recalled_{t}"] = jnp.sum((best > t) & gt_valid)
        return out

    per = jax.vmap(single)(gt, pred_boxes, pred_counts)
    return {k: jnp.sum(v) for k, v in per.items()}
