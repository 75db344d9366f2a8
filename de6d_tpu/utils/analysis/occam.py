"""OccAM: perturbation-based attribution for 3D detectors.

Parity: reference utils/analysis/occam.py (:83-605) +
tools/experiments/occam_analysis.py: randomly sub-sample the point
cloud many times, run the detector on each perturbation, and credit
each point with the similarity between the base detections and the
perturbed detections that still match them — producing a per-point
importance map per detection.

TPU design: perturbations are batched (B_pert clouds per forward) and
the whole perturbed-inference loop is one jitted function over fixed
shapes; mask generation uses voxel-level Bernoulli keep decisions like
the reference's sub-sampling masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import iou3d
from ...models.detectors.detector3d_template import post_processing


class OccamAnalyzer:
    def __init__(self, model, variables, model_cfg, num_class,
                 keep_prob: float = 0.5, voxel_size: float = 1.0,
                 batch_size: int = 8, seed: int = 0):
        self.model = model
        self.variables = variables
        self.model_cfg = model_cfg
        self.num_class = num_class
        self.keep_prob = keep_prob
        self.voxel_size = voxel_size
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)

        @jax.jit
        def infer(params, stats, points, mask):
            bd = {"points": points, "points_mask": mask}
            v = {"params": params}
            if stats:
                v["batch_stats"] = stats
            out = self.model.apply(v, bd, train=False)
            post = post_processing(
                out, model_cfg["POST_PROCESSING"], num_class
            )
            return post

        self._infer = infer

    def _sample_mask(self, points):
        """Voxel-level Bernoulli sub-sampling mask (reference mask
        generation over 3D cells)."""
        cells = np.floor(points[:, :3] / self.voxel_size).astype(np.int64)
        keys, inverse = np.unique(
            cells, axis=0, return_inverse=True
        )
        keep_cell = self.rng.random_sample(len(keys)) < self.keep_prob
        return keep_cell[inverse]

    def attribute(self, points: np.ndarray, n_perturbations: int = 300,
                  match_iou: float = 0.3):
        """Returns (base_detections dict, importance (D, N) per-point
        attribution for each base detection)."""
        n = points.shape[0]
        params = self.variables["params"]
        stats = self.variables.get("batch_stats", {})

        pts = jnp.asarray(points[None])
        full_mask = jnp.ones((1, n), bool)
        base = jax.tree_util.tree_map(
            np.asarray, self._infer(params, stats, pts, full_mask)
        )
        n_det = int(base["pred_count"][0])
        base_boxes = base["pred_boxes"][0, :n_det]
        base_labels = base["pred_labels"][0, :n_det]

        importance = np.zeros((n_det, n), np.float32)
        counts = np.zeros((n_det, n), np.float32) + 1e-6

        batch = self.batch_size
        pts_b = jnp.broadcast_to(pts, (batch, n, points.shape[1]))
        done = 0
        while done < n_perturbations:
            masks = np.stack(
                [self._sample_mask(points) for _ in range(batch)]
            )
            out = jax.tree_util.tree_map(
                np.asarray,
                self._infer(params, stats, pts_b, jnp.asarray(masks)),
            )
            for b in range(batch):
                cnt = int(out["pred_count"][b])
                if cnt == 0 or n_det == 0:
                    done += 1
                    continue
                boxes = out["pred_boxes"][b, :cnt]
                labels = out["pred_labels"][b, :cnt]
                scores = out["pred_scores"][b, :cnt]
                iou = np.asarray(
                    iou3d.boxes_iou3d(
                        jnp.asarray(base_boxes[:, :7]),
                        jnp.asarray(boxes[:, :7]),
                    )
                )
                same_cls = base_labels[:, None] == labels[None, :]
                iou = np.where(same_cls, iou, 0.0)
                best = iou.max(axis=1)
                best_j = iou.argmax(axis=1)
                sim = np.where(best > match_iou, best * scores[best_j], 0.0)
                kept = masks[b].astype(np.float32)
                importance += sim[:, None] * kept[None, :]
                counts += kept[None, :]
                done += 1
        return (
            {
                "boxes": base_boxes,
                "labels": base_labels,
                "scores": base["pred_scores"][0, :n_det],
            },
            importance / counts,
        )
