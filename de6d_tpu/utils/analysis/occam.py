"""OccAM — perturbation-based attribution for 3D detectors.

Parity: reference utils/analysis/occam.py:83-605 (full fidelity):
- sub-sampling: the point cloud is randomly rotated (±RANDOM_ROT°) and
  sub-voxel translated each iteration, voxelized on a SAMPLING.VOXEL
  grid, and voxels survive a Bernoulli draw with probability
  λ·poly₂(distance) (DENSITY_DISTR_COEFF) — the paper's
  density-equalizing sampling (:168-215);
- similarity: every (base, perturbed) detection pair that overlaps
  (IoU>0) with matching class contributes per-property channels
  [confidence, translation 1−‖Δt‖, scale (aligned-box IoU with
  centers/yaw zeroed), orientation 1−Δyaw; +pitch/roll ×4 for 9-DoF
  boxes] (:371-489);
- attribution maps: per base detection and point, the mean channel
  similarity over the iterations in which that point was kept,
  normalized by how often it was kept (:491-575).

TPU-first: the perturbed forwards run as one jitted batched inference;
all host math is vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...models.detectors.detector3d_template import post_processing
from ...ops import iou3d

CHANNEL_NAMES_7D = ("conf", "transl", "scale", "orient")
CHANNEL_NAMES_9D = CHANNEL_NAMES_7D + ("pitch", "roll")


def _rot_z(deg):
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def translation_score(base, pert):
    err = np.linalg.norm(
        base[:, None, :3] - pert[None, :, :3], axis=-1
    )
    return np.clip(1.0 - err, 0.0, None)


def orientation_score(base, pert, ind):
    def wrap(a):
        a = a % (2 * np.pi)
        return np.where(a > np.pi, a - 2 * np.pi, a)

    a = wrap(base[:, ind])[:, None]
    b = wrap(pert[:, ind])[None, :]
    e = np.abs(a - b)
    e = np.minimum(e, 2 * np.pi - e)
    score = 1.0 - (e if ind == 6 else e * 4)
    return np.clip(score, 0.0, None)


def scale_score(base, pert):
    """Aligned-box IoU with centers and yaw zeroed (:422-434)."""
    a = base.copy()
    b = pert.copy()
    a[:, :3] = 0
    a[:, 6] = 0
    b[:, :3] = 0
    b[:, 6] = 0
    return np.clip(np.asarray(iou3d.boxes_iou3d(
        jnp.asarray(a[:, :7], jnp.float32),
        jnp.asarray(b[:, :7], jnp.float32),
    )), 0.0, None)


def similarity_channels(base_boxes, base_labels, pert_boxes, pert_labels,
                        pert_scores):
    """(K, L) validity mask + list of (K, L) property channels
    (reference get_similarity_matrix :436-489)."""
    iou = np.asarray(iou3d.boxes_iou3d(
        jnp.asarray(base_boxes[:, :7], jnp.float32),
        jnp.asarray(pert_boxes[:, :7], jnp.float32),
    ))
    valid = (iou > 0).astype(np.float32) * (
        base_labels[:, None] == pert_labels[None, :]
    ).astype(np.float32)
    channels = [
        np.repeat(pert_scores[None, :], base_boxes.shape[0], axis=0),
        translation_score(base_boxes, pert_boxes),
        scale_score(base_boxes, pert_boxes),
        orientation_score(base_boxes, pert_boxes, 6),
    ]
    if base_boxes.shape[1] > 7:
        channels.append(orientation_score(base_boxes, pert_boxes, 7))
        channels.append(orientation_score(base_boxes, pert_boxes, 8))
    return valid, channels


class OccamAnalyzer:
    def __init__(self, model, variables, model_cfg, num_class,
                 voxel_size=(0.35, 0.35, 0.35), batch_size=8,
                 random_rot=10.0, lbda=0.15,
                 density_coeff=(0.0, 0.0, 1.0), seed=0):
        self.model = model
        self.variables = variables
        self.num_class = num_class
        self.voxel_size = np.asarray(voxel_size, np.float64)
        self.batch_size = batch_size
        self.random_rot = float(random_rot)
        self.lbda = float(lbda)
        self.density_coeff = np.asarray(density_coeff, np.float64)
        self.rng = np.random.RandomState(seed)

        def infer(params, stats, points, mask):
            bd = {"points": points, "points_mask": mask}
            v = {"params": params}
            if stats:
                v["batch_stats"] = stats
            out = self.model.apply(v, bd, train=False)
            return post_processing(
                out, model_cfg["POST_PROCESSING"], num_class
            )

        self._infer = jax.jit(infer)

    def _sample_mask(self, points):
        """One sub-sampling draw (reference OccamInferenceDataset
        __getitem__ :168-215): jittered-frame voxelization + distance-
        dependent voxel survival."""
        rot = self.rng.rand() * 2 * self.random_rot - self.random_rot
        mat = _rot_z(rot)
        transl = (
            self.rng.rand(1, 3) - 0.5
        ) * self.voxel_size[None, :]
        pts = points[:, :3] @ mat.T + transl

        cells = np.floor(pts / self.voxel_size).astype(np.int64)
        keys, inverse = np.unique(cells, axis=0, return_inverse=True)

        # voxel centers back in the ORIGINAL frame for the distance term
        centers = (keys + 0.5) * self.voxel_size - transl
        centers = centers @ np.linalg.inv(mat).T
        dist = np.linalg.norm(centers, axis=1)
        keep_prob = self.lbda * (
            dist ** 2 * self.density_coeff[0]
            + dist * self.density_coeff[1]
            + self.density_coeff[2]
        )
        keep_cell = self.rng.rand(len(keys)) < keep_prob
        return keep_cell[inverse]

    def attribute(self, points: np.ndarray, n_perturbations: int = 300):
        """Returns (base detections dict, attribution maps
        (K, N, C) with channels conf/transl/scale/orient[/pitch/roll],
        and the sampling count map (N,))."""
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
        n_ch = 6 if base_boxes.shape[-1] > 7 else 4

        attr = np.zeros((n_det, n, n_ch), np.float32)
        sampling_map = np.zeros(n, np.float32)

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
                if done >= n_perturbations:
                    break
                kept = masks[b].astype(np.float32)
                sampling_map += kept
                cnt = int(out["pred_count"][b])
                done += 1
                if cnt == 0 or n_det == 0:
                    continue
                boxes = out["pred_boxes"][b, :cnt]
                labels = out["pred_labels"][b, :cnt]
                scores = out["pred_scores"][b, :cnt]
                valid, channels = similarity_channels(
                    base_boxes, base_labels, boxes, labels, scores
                )
                # best-matching perturbed det per base det (reference
                # reduces per batch via max over L)
                for c, ch in enumerate(channels):
                    s = (valid * ch).max(axis=1)  # (K,)
                    attr[:, :, c] += s[:, None] * kept[None, :]
        attr /= np.clip(sampling_map[None, :, None], 1.0, None)
        return (
            {
                "boxes": base_boxes,
                "labels": base_labels,
                "scores": base["pred_scores"][0, :n_det],
                "channels": (
                    CHANNEL_NAMES_9D if n_ch == 6 else CHANNEL_NAMES_7D
                ),
            },
            attr,
            sampling_map,
        )
