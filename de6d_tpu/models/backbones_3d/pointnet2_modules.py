"""PointNet++ set-abstraction / feature-propagation modules — batched,
fixed-shape, mask-carrying flax modules.

Parity: reference pointnet2_batch/pointnet2_modules.py —
PointnetSAModuleMSG(+FS variants, :358-494) and PointnetFPModule. The
ragged "stack" API is replaced by dense (B, N, …) tensors + validity
masks (SURVEY.md §7.1); the CUDA sampling/grouping kernels by the XLA
ops in de6d_tpu.ops.

Sampling methods (reference SAMPLE_METHOD_LIST dispatch, :380-444):
d-fps, f-fps (fused xyz+feature distance), s-fps (sigmoid(score)^γ
weights), c-fps (top-k score), df-fps (inverse pillar-density
weights), sectorized-fps (polar sector split). Ground-aware variants
(g-fps/gd-fps/daps) live in sampling_ground.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import ball_query as bq
from ...ops import sampling
from ..model_utils.mlp import SharedMLP


def run_sampling(
    method: str,
    xyz,
    features,
    scores,
    valid,
    npoint: int,
    sample_range,
    weight_gamma: float = 1.0,
):
    """One entry of SAMPLE_METHOD_LIST on a slice of the point dim.
    Returns (B, npoint) indices into the FULL point dim."""
    lo, hi = int(sample_range[0]), int(sample_range[1])
    if hi == -1:
        hi = xyz.shape[1]
    xyz_s = xyz[:, lo:hi]
    valid_s = valid[:, lo:hi]

    if method == "d-fps":
        idx = sampling.farthest_point_sample(xyz_s, npoint, valid_s)
    elif method == "f-fps":
        # fp32 distance keys regardless of compute dtype (FPS argmax
        # tie order must not depend on COMPUTE_DTYPE)
        feat_s = features[:, lo:hi].astype(jnp.float32)
        dm = sampling.calc_dist_matrix_for_sampling(
            xyz_s, feat_s, weight_gamma
        )
        idx = sampling.matrix_farthest_point_sample(dm, npoint, valid_s)
    elif method == "s-fps":
        assert scores is not None, "s-fps needs confidence scores"
        w = jax.nn.sigmoid(scores[:, lo:hi]) ** weight_gamma
        idx = sampling.weighted_farthest_point_sample(
            xyz_s, w, npoint, valid_s
        )
    elif method == "c-fps":
        assert scores is not None
        w = jax.nn.sigmoid(scores[:, lo:hi]) ** weight_gamma
        idx = sampling.sample_top_k_by_score(w, npoint, valid_s)
    elif method == "df-fps":
        # inverse 2x2 m pillar-occupancy weights (reference :389-414;
        # the reference hardcodes the KITTI range — we derive counts
        # from a 2 m grid directly)
        cell = jnp.floor(xyz_s[..., :2] / 2.0).astype(jnp.int32)
        key = (cell[..., 0] + 4096) * 8192 + (cell[..., 1] + 4096)

        def density(k, v):
            uniq, inv, counts = jnp.unique(
                k, return_inverse=True, return_counts=True,
                size=k.shape[0], fill_value=-1,
            )
            return 1.0 / counts[inv].astype(jnp.float32)

        w = jax.vmap(density)(key, valid_s)
        idx = sampling.weighted_farthest_point_sample(
            xyz_s, w, npoint, valid_s
        )
    elif method == "sectorized-fps":
        from .sampling_ground import sectorized_farthest_point_sample

        idx = sectorized_farthest_point_sample(
            xyz_s, npoint, valid_s, num_sectors=6
        )
    elif method in ("g-fps", "gd-fps", "daps"):
        from . import sampling_ground

        fn = {
            "g-fps": sampling_ground.ground_aware_farthest_point_sample,
            "gd-fps": sampling_ground.gd_farthest_point_sample,
            "daps": sampling_ground.density_aware_point_sample,
        }[method]
        idx = fn(xyz_s, npoint, valid_s)
    else:
        raise NotImplementedError(method)
    return idx + lo


class PointnetSAModuleFSMSG(nn.Module):
    """Multi-scale-grouping SA layer with fusion sampling.

    All reference options: multi-method sampling over point-slice
    ranges, dilated radius groups, skip connection, aggregation MLP,
    confidence MLP (for the next layer's s-fps).
    """

    radii: tuple
    nsamples: tuple
    mlps: tuple  # tuple of channel tuples, per scale
    npoint_list: tuple = ()
    sample_range_list: tuple = ()
    sample_method_list: tuple = ()
    use_xyz: bool = True
    dilated_radius_group: bool = False
    skip_connection: bool = False
    weight_gamma: float = 1.0
    aggregation_mlp: tuple = ()
    confidence_mlp: tuple = ()
    confidence_num_class: int = 0  # >0: per-class logits (IA-SSD)
    use_bn: bool = True
    pool_method: str = "max_pool"
    # compute dtype for the grouped/aggregation/confidence MLPs (bf16
    # MXU path). Geometry — sampling, ball query, grouped-xyz offsets —
    # always stays fp32: bf16 absolute coords only resolve ~0.25 m at
    # KITTI ranges. Scores returned to callers are cast back to fp32.
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, valid=None, scores=None,
                 new_xyz=None, new_valid=None, train: bool = False):
        """xyz (B, N, 3); features (B, N, C) or None; valid (B, N);
        scores (B, N) or None; optional externally-supplied centers.

        Returns (new_xyz (B, M, 3), new_features (B, M, C'),
        new_scores (B, M)|None, new_valid (B, M))."""
        b, n, _ = xyz.shape
        if valid is None:
            valid = jnp.ones((b, n), dtype=bool)

        old_features = None
        if new_xyz is None:
            idx_list = [
                run_sampling(
                    m, xyz, features, scores, valid, int(np_i), rng,
                    self.weight_gamma,
                )
                for m, np_i, rng in zip(
                    self.sample_method_list, self.npoint_list,
                    self.sample_range_list,
                )
            ]
            sample_idx = jnp.concatenate(idx_list, axis=-1)
            new_xyz = sampling.gather_points(xyz, sample_idx)
            new_valid = jnp.take_along_axis(valid, sample_idx, axis=1)
            if self.skip_connection and features is not None:
                old_features = sampling.gather_points(features, sample_idx)
        elif new_valid is None:
            new_valid = jnp.ones(new_xyz.shape[:2], dtype=bool)

        pooled_list = []
        prev_radius = 0.0
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            r_in = prev_radius if self.dilated_radius_group else 0.0
            grouped, cnt = bq.query_and_group(
                xyz, new_xyz, features,
                radius=float(radius), nsample=int(nsample),
                valid_mask=valid, new_valid_mask=new_valid,
                radius_in=float(r_in), use_xyz=self.use_xyz,
            )  # (B, M, ns, C_in)
            prev_radius = radius
            out = SharedMLP(
                tuple(mlp), use_bn=self.use_bn, dtype=self.dtype
            )(grouped, train)
            mask = (cnt > 0)[..., None, None]
            out = jnp.where(mask, out, 0.0)
            if self.pool_method == "max_pool":
                pooled = jnp.max(
                    jnp.where(mask, out, -jnp.inf), axis=2
                )
                pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
            else:
                # accumulate in fp32: summing nsample bf16 activations
                # loses precision the max_pool branch doesn't
                denom = jnp.maximum(cnt[..., None], 1).astype(jnp.float32)
                pooled = (jnp.sum(out.astype(jnp.float32), axis=2)
                          / denom).astype(out.dtype)
            pooled_list.append(pooled)

        if old_features is not None:
            pooled_list.append(old_features.astype(pooled_list[0].dtype))
        new_features = jnp.concatenate(pooled_list, axis=-1)

        if self.aggregation_mlp:
            new_features = SharedMLP(
                tuple(self.aggregation_mlp), use_bn=self.use_bn,
                dtype=self.dtype,
            )(new_features, train)

        new_scores = None
        if self.confidence_mlp:
            h = SharedMLP(
                tuple(self.confidence_mlp), use_bn=self.use_bn,
                dtype=self.dtype,
            )(new_features, train)
            if self.confidence_num_class > 0:
                # per-class logits (IA-SSD ctr_aware sampling + the
                # instance-aware SA losses); 0 = legacy scalar scores
                # (SASA s-fps weights)
                new_scores = nn.Dense(self.confidence_num_class)(h)
            else:
                new_scores = nn.Dense(1)(h).squeeze(-1)

        return new_xyz, new_features, new_scores, new_valid


class PointnetSAModuleMSG(PointnetSAModuleFSMSG):
    """Plain MSG SA layer: single d-fps sampler over the full range
    (reference PointnetSAModuleMSG)."""

    npoint: int = 0

    def __call__(self, xyz, features=None, valid=None, scores=None,
                 new_xyz=None, new_valid=None, train: bool = False):
        return super().__call__(
            xyz, features, valid, scores, new_xyz, new_valid, train
        )


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP
    (reference PointnetFPModule)."""

    mlp: tuple
    use_bn: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 known_valid=None, train: bool = False):
        """unknown (B, N, 3), known (B, M, 3), unknown_feats (B, N, C1)
        or None, known_feats (B, M, C2) → (B, N, mlp[-1])."""
        dist, idx = bq.three_nn(unknown, known, known_valid)
        weight = bq.three_nn_interpolate_weights(dist)
        interpolated = bq.three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            new_features = jnp.concatenate(
                [interpolated.astype(self.dtype),
                 unknown_feats.astype(self.dtype)], axis=-1
            )
        else:
            new_features = interpolated
        return SharedMLP(
            tuple(self.mlp), use_bn=self.use_bn, dtype=self.dtype
        )(new_features, train)
