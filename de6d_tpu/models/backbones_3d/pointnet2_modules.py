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
from ...ops import binned
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
    # spatially binned ball query (ops.binned): non-empty pc_range
    # enables one shared cell-sort + 3x3-window candidate pruning for
    # all MSG scales, replacing the per-scale brute-force (M, N)
    # distance sweep. Exact: beyond-cap points land in a global spill
    # table every window also scans (ops.binned docstring); the
    # in-graph brute fallback (one lax.cond) fires only if the SPILL
    # overflows bin_spill_cap — not on the first dense cell.
    pc_range: tuple = ()
    bin_cell_cap: int = 128
    bin_spill_cap: int = 256

    def _scale_tuples(self):
        """Static (radii, inner radii, nsamples) tuples per scale."""
        r_ins = []
        prev = 0.0
        for r in self.radii:
            r_ins.append(prev if self.dilated_radius_group else 0.0)
            prev = float(r)
        return (
            tuple(float(r) for r in self.radii),
            tuple(float(r) for r in r_ins),
            tuple(int(s) for s in self.nsamples),
        )

    def _binned_ok(self, n: int) -> bool:
        """Binning pays only when the 3x3 window genuinely prunes: the
        window holds <= 9*cap candidate slots vs N brute columns."""
        if not (self.pc_range and self.bin_cell_cap > 0):
            return False
        gx, gy = binned.grid_dims(
            self.pc_range, max(float(r) for r in self.radii)
        )
        cand = 9 * self.bin_cell_cap + max(0, int(self.bin_spill_cap))
        return gx * gy >= 64 and cand < n

    def _query_all_scales(self, xyz, new_xyz, valid, new_valid):
        """(idx, cnt) per scale — binned when it prunes, else brute."""
        n = xyz.shape[1]
        radii, r_ins, nsamples = self._scale_tuples()

        def brute(_):
            return tuple(
                bq.ball_query(
                    xyz, new_xyz, r, ns, valid, new_valid, radius_in=ri
                )
                for r, ri, ns in zip(radii, r_ins, nsamples)
            )

        if not self._binned_ok(n):
            return brute(None)

        res, overflow = binned.binned_msg_query(
            xyz, new_xyz, radii, nsamples, valid, new_valid,
            radius_in_list=r_ins, pc_range=tuple(self.pc_range),
            cell_cap=int(self.bin_cell_cap),
            spill_cap=int(self.bin_spill_cap),
        )
        return jax.lax.cond(
            jnp.max(overflow) > 0,
            brute,
            lambda _: tuple((i, c) for i, c in res),
            None,
        )

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

        # explicit child names = the auto names the pre-fused compact
        # loop assigned (SharedMLP_0..S-1 scales, then aggregation,
        # then confidence) — keeps existing checkpoints loading
        scale_mlps = [
            SharedMLP(
                tuple(mlp), use_bn=self.use_bn, dtype=self.dtype,
                name=f"SharedMLP_{i}",
            )
            for i, mlp in enumerate(self.mlps)
        ]
        radii, r_ins, nsamples = self._scale_tuples()

        fused = (
            not train
            and not self.is_initializing()
            and self._binned_ok(n)
        )
        if fused:
            # query + group + MLP + pool in one pass per center chunk
            # (BN folds to affine at inference; the grouped tensor
            # never reaches HBM at (B, M, ns, C)); in-graph brute
            # fallback keeps exactness if a cell overflows the cap
            folded = [mod.folded() for mod in scale_mlps]
            common = dict(
                radii=radii, nsamples=nsamples, radius_in_list=r_ins,
                use_xyz=self.use_xyz, pool_method=self.pool_method,
                dtype=self.dtype,
            )
            over = binned.cell_overflow(
                xyz, valid, tuple(self.pc_range), max(radii),
                int(self.bin_cell_cap),
            )
            pooled_t, cnt_t = jax.lax.cond(
                jnp.max(over) > int(self.bin_spill_cap),
                lambda _: binned.brute_sa_infer(
                    xyz, features, new_xyz, folded, valid, new_valid,
                    **common,
                ),
                lambda _: binned.binned_sa_infer(
                    xyz, features, new_xyz, folded, valid, new_valid,
                    pc_range=tuple(self.pc_range),
                    cell_cap=int(self.bin_cell_cap),
                    spill_cap=int(self.bin_spill_cap), **common,
                ),
                None,
            )
            pooled_list = list(pooled_t)
        else:
            idx_cnt = self._query_all_scales(xyz, new_xyz, valid, new_valid)
            pooled_list = []
            for i in range(len(self.mlps)):
                idx, cnt = idx_cnt[i]
                grouped = bq.group_with_idx(
                    xyz, new_xyz, features, idx, use_xyz=self.use_xyz
                )  # (B, M, ns, C_in)
                out = scale_mlps[i](grouped, train)
                mask = (cnt > 0)[..., None, None]
                out = jnp.where(mask, out, 0.0)
                if self.pool_method == "max_pool":
                    pooled = jnp.max(
                        jnp.where(mask, out, -jnp.inf), axis=2
                    )
                    pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
                else:
                    # accumulate in fp32: summing nsample bf16
                    # activations loses precision max_pool doesn't
                    denom = jnp.maximum(
                        cnt[..., None], 1
                    ).astype(jnp.float32)
                    pooled = (jnp.sum(out.astype(jnp.float32), axis=2)
                              / denom).astype(out.dtype)
                pooled_list.append(pooled)

        if old_features is not None:
            pooled_list.append(old_features.astype(pooled_list[0].dtype))
        new_features = jnp.concatenate(pooled_list, axis=-1)

        n_named = len(self.mlps)
        if self.aggregation_mlp:
            new_features = SharedMLP(
                tuple(self.aggregation_mlp), use_bn=self.use_bn,
                dtype=self.dtype, name=f"SharedMLP_{n_named}",
            )(new_features, train)
            n_named += 1

        new_scores = None
        if self.confidence_mlp:
            h = SharedMLP(
                tuple(self.confidence_mlp), use_bn=self.use_bn,
                dtype=self.dtype, name=f"SharedMLP_{n_named}",
            )(new_features, train)
            # final score Dense is ALWAYS fp32: scores drive s-fps/c-fps
            # SELECTION and the SASA losses — decisions and predictions
            # stay fp32 (dtype_utils contract). A bf16 final Dense
            # quantizes scores onto an 8-bit-mantissa grid, the sampled
            # set thrashes across quantization boundaries, and every
            # upstream gradient decorrelates (measured cos ≈ 0 across
            # the whole backbone — tools/bf16_grad_probe.py; the r4
            # full-scale Det6D bf16 stall).
            h = h.astype(jnp.float32)
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
