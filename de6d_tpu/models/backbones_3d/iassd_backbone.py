"""Exact IA-SSD encoder.

Parity: reference backbones_3d/IASSD_backbone.py:8-192 and the
PointnetSAModuleMSG_WithSampling / Vote_layer modules
(ops/pointnet2/pointnet2_batch/pointnet2_modules.py:610-931):

- generic layer plumbing: LAYER_TYPE ('SA_Layer' | 'Vote_Layer'),
  LAYER_INPUT (which earlier output feeds each layer), CTR_INDEX
  (aggregate at given centers instead of sampling);
- sampling types: D-FPS, F-FPS, FS (both, concatenated), ctr_aware /
  cls (top-k by sigmoid of the max class logit from the previous
  layer's confidence MLP), Rand, ds-FPS / ry-FPS (radius / azimuth
  4-way partition + per-part FPS);
- per-layer confidence MLPs emit NUM_CLASS logits (sa_ins_preds) that
  feed both the next layer's ctr_aware sampling and the head's
  instance-aware losses;
- the Vote_Layer regresses clamped center offsets; the final SA layer
  aggregates at the votes (ctr_xyz path).

TPU-first: padded fixed shapes + validity masks; all sampling is the
vectorized XLA in ops/sampling.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sampling
from ...registry import BACKBONES_3D
from ..model_utils.dtype_utils import compute_dtype
from ..model_utils.mlp import SharedMLP
from .pointnet2_modules import PointnetSAModuleFSMSG


class SampleOnlyLayer(nn.Module):
    """SA layer with no groupers (reference WithSampling with empty
    radii): sample, gather features, optional confidence MLP."""

    confidence_mlp: tuple = ()
    confidence_num_class: int = 1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_logits = None
        if self.confidence_mlp:
            h = SharedMLP(tuple(self.confidence_mlp))(feats, train)
            cls_logits = nn.Dense(self.confidence_num_class)(h)
        return feats, cls_logits


class VoteLayer(nn.Module):
    """Reference Vote_layer (:876-931): shared 1x1 MLP → 3 offsets,
    clamped per-axis to max_translate_range."""

    mlp_list: tuple
    max_translate_range: tuple

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        h = features
        for c in self.mlp_list:
            h = nn.Dense(int(c), use_bias=False)(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3
            )(h)
            h = nn.relu(h)
        offsets = nn.Dense(3)(h)  # (B, N, 3)
        if self.max_translate_range:
            lim = jnp.asarray(self.max_translate_range, offsets.dtype)
            offsets = jnp.clip(offsets, -lim, lim)
        return xyz + offsets, offsets


def _part_fps(xyz, keys, npoint: int, valid, parts: int = 4):
    """ds-FPS / ry-FPS: sort by key, split into `parts` contiguous
    chunks, FPS npoint//parts in each (reference :786-845)."""
    b, n, _ = xyz.shape
    order = jnp.argsort(jnp.where(valid, keys, jnp.inf), axis=1)
    xyz_s = jnp.take_along_axis(xyz, order[..., None], axis=1)
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    per = n // parts
    m = npoint // parts
    xyz_div = xyz_s[:, : per * parts].reshape(b * parts, per, 3)
    valid_div = valid_s[:, : per * parts].reshape(b * parts, per)
    idx = sampling.farthest_point_sample(xyz_div, m, valid_div)
    idx = idx.reshape(b, parts, m) + (
        jnp.arange(parts, dtype=jnp.int32)[None, :, None] * per
    )
    idx = idx.reshape(b, parts * m)
    return jnp.take_along_axis(order, idx, axis=1)


def run_sampling_iassd(method, xyz, features, cls_logits, valid,
                       npoint: int, sample_range):
    """One sampling group (reference WithSampling.forward:735-845).
    Returns (B, npoint[*2 for FS]) indices into the FULL point dim."""
    lo, hi = sample_range
    hi = xyz.shape[1] if hi == -1 else hi
    xyz_s = xyz[:, lo:hi]
    valid_s = valid[:, lo:hi]

    if ("cls" in method) or ("ctr" in method):
        logits = cls_logits[:, lo:hi]
        if logits.ndim == 3:  # (B, N, num_class) → max class logit
            logits = jnp.max(logits, axis=-1)
        score = jax.nn.sigmoid(logits)
        idx = sampling.sample_top_k_by_score(score, npoint, valid_s)
    elif method in ("D-FPS", "DFS", "d-fps"):
        idx = sampling.farthest_point_sample(xyz_s, npoint, valid_s)
    elif method in ("F-FPS", "FFS", "f-fps"):
        # fp32 keys: FPS argmax order must not depend on COMPUTE_DTYPE
        # (same invariant as pointnet2_modules.run_sampling)
        dm = sampling.calc_dist_matrix_for_sampling(
            xyz_s, features[:, lo:hi].astype(jnp.float32)
        )
        idx = sampling.matrix_farthest_point_sample(dm, npoint, valid_s)
    elif method == "FS":
        dm = sampling.calc_dist_matrix_for_sampling(
            xyz_s, features[:, lo:hi].astype(jnp.float32)
        )
        i1 = sampling.matrix_farthest_point_sample(dm, npoint, valid_s)
        i2 = sampling.farthest_point_sample(xyz_s, npoint, valid_s)
        idx = jnp.concatenate([i1, i2], axis=-1)
    elif "Rand" in method:
        # reference uses an unseeded randperm; a fixed stride keeps it
        # deterministic under jit (documented deviation)
        n = xyz_s.shape[1]
        stride = max(1, n // npoint)
        idx = (jnp.arange(npoint, dtype=jnp.int32) * stride % n)[None, :]
        idx = jnp.broadcast_to(idx, (xyz.shape[0], npoint))
    elif method in ("ds_FPS", "ds-FPS"):
        keys = jnp.linalg.norm(xyz_s, axis=-1) - 5.0
        idx = _part_fps(xyz_s, keys, npoint, valid_s)
    elif method in ("ry_FPS", "ry-FPS"):
        keys = jnp.arctan(xyz_s[..., 0] / jnp.where(
            jnp.abs(xyz_s[..., 1]) < 1e-6, 1e-6, xyz_s[..., 1]
        ))
        idx = _part_fps(xyz_s, keys, npoint, valid_s)
    else:
        raise NotImplementedError(f"IASSD sampling {method}")
    return idx + lo


@BACKBONES_3D.register
class IASSD_Backbone(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple = (0, 0, 0)
    num_class: int = 3
    point_cloud_range: tuple = ()  # enables the binned ball query

    def setup(self):
        sa = self.model_cfg["SA_CONFIG"]
        self.layer_types = list(sa["LAYER_TYPE"])
        self.layer_inputs = list(sa["LAYER_INPUT"])
        self.ctr_indexes = list(sa.get("CTR_INDEX", [-1] * len(self.layer_types)))
        self.npoint_list = list(sa["NPOINT_LIST"])
        self.range_list = list(
            sa.get("SAMPLE_RANGE_LIST", [[0, -1]] * len(self.layer_types))
        )
        self.method_list = list(sa["SAMPLE_METHOD_LIST"])
        agg_mlps = sa.get("AGGREGATION_MLPS")
        conf_mlps = sa.get("CONFIDENCE_MLPS")

        modules = []
        for k, ltype in enumerate(self.layer_types):
            if ltype == "SA_Layer":
                agg = tuple(agg_mlps[k]) if agg_mlps and agg_mlps[k] else ()
                conf = (
                    tuple(conf_mlps[k]) if conf_mlps and conf_mlps[k] else ()
                )
                radii = tuple(float(r) for r in sa["RADIUS_LIST"][k])
                if not radii:
                    # sampling-only layer (reference: empty groupers →
                    # gather features at the sampled indices)
                    modules.append(SampleOnlyLayer(
                        confidence_mlp=conf,
                        confidence_num_class=self.num_class,
                    ))
                    continue
                modules.append(PointnetSAModuleFSMSG(
                    radii=radii,
                    nsamples=tuple(int(x) for x in sa["NSAMPLE_LIST"][k]),
                    mlps=tuple(tuple(m) for m in sa["MLPS"][k]),
                    use_xyz=True,
                    dilated_radius_group=bool(
                        sa.get("DILATED_GROUP", [False] * 99)[k]
                    ),
                    aggregation_mlp=agg,
                    confidence_mlp=conf,
                    confidence_num_class=self.num_class,
                    dtype=compute_dtype(self.model_cfg),
                    pc_range=tuple(self.point_cloud_range),
                    bin_cell_cap=(
                        int(sa.get("BIN_CELL_CAP", 128))
                        if sa.get("BINNED_QUERY", True) else 0
                    ),
                    bin_spill_cap=int(sa.get("BIN_SPILL_CAP", 256)),
                ))
            elif ltype == "Vote_Layer":
                modules.append(VoteLayer(
                    mlp_list=tuple(sa["MLPS"][k]),
                    max_translate_range=tuple(
                        sa.get("MAX_TRANSLATE_RANGE", ())
                    ),
                ))
            else:
                raise NotImplementedError(ltype)
        self.sa_modules = modules
        # output width: last GROUPING SA layer's aggregation (or mlp
        # sum) — sampling-only layers keep their input width
        last_sa = max(
            i for i, t in enumerate(self.layer_types)
            if t == "SA_Layer" and sa["RADIUS_LIST"][i]
        )
        if agg_mlps and agg_mlps[last_sa]:
            self.num_point_features = int(agg_mlps[last_sa][-1])
        else:
            self.num_point_features = sum(
                m[-1] for m in sa["MLPS"][last_sa]
            )

    def __call__(self, batch_dict, train: bool = False):
        points = batch_dict["points"]  # (B, N, 3+C)
        valid = batch_dict.get(
            "points_mask", jnp.ones(points.shape[:2], bool)
        )
        xyz = points[..., :3]
        feats = points[..., 3:]

        enc_xyz = [xyz]
        enc_feats = [feats]
        enc_valid = [valid]
        sa_ins_preds = [None]  # align with encoder_coords (input slot)
        cls_logits = None
        centers = centers_origin = ctr_offsets = None

        for k, mod in enumerate(self.sa_modules):
            inp = self.layer_inputs[k]
            xyz_in = enc_xyz[inp]
            feat_in = enc_feats[inp]
            valid_in = enc_valid[inp]

            if self.layer_types[k] == "SA_Layer":
                ctr_i = self.ctr_indexes[k]
                if isinstance(mod, SampleOnlyLayer):
                    idx_list = [
                        run_sampling_iassd(
                            m, xyz_in, feat_in, cls_logits, valid_in,
                            int(np_), rng_,
                        )
                        for m, np_, rng_ in zip(
                            self.method_list[k], self.npoint_list[k],
                            self.range_list[k]
                            if isinstance(self.range_list[k][0], (list, tuple))
                            else [self.range_list[k]],
                        )
                    ]
                    sample_idx = jnp.concatenate(idx_list, axis=-1)
                    li_xyz = sampling.gather_points(xyz_in, sample_idx)
                    li_valid = jnp.take_along_axis(
                        valid_in, sample_idx, axis=1
                    )
                    gathered = sampling.gather_points(feat_in, sample_idx)
                    li_feats, li_cls = mod(gathered, train=train)
                elif ctr_i != -1:
                    new_xyz = enc_xyz[ctr_i]
                    new_valid = enc_valid[ctr_i]
                    li_xyz, li_feats, li_cls, li_valid = mod(
                        xyz_in, feat_in, valid_in,
                        new_xyz=new_xyz, new_valid=new_valid, train=train,
                    )
                else:
                    idx_list = [
                        run_sampling_iassd(
                            m, xyz_in, feat_in, cls_logits, valid_in,
                            int(np_), rng_,
                        )
                        for m, np_, rng_ in zip(
                            self.method_list[k], self.npoint_list[k],
                            self.range_list[k]
                            if isinstance(self.range_list[k][0], (list, tuple))
                            else [self.range_list[k]],
                        )
                    ]
                    sample_idx = jnp.concatenate(idx_list, axis=-1)
                    new_xyz = sampling.gather_points(xyz_in, sample_idx)
                    new_valid = jnp.take_along_axis(
                        valid_in, sample_idx, axis=1
                    )
                    li_xyz, li_feats, li_cls, li_valid = mod(
                        xyz_in, feat_in, valid_in,
                        new_xyz=new_xyz, new_valid=new_valid, train=train,
                    )
                cls_logits = li_cls
            else:  # Vote_Layer
                li_xyz, offsets = mod(xyz_in, feat_in, train=train)
                centers = li_xyz
                centers_origin = xyz_in
                ctr_offsets = offsets
                li_feats = feat_in
                li_valid = valid_in
                li_cls = None

            enc_xyz.append(li_xyz)
            enc_feats.append(li_feats)
            enc_valid.append(li_valid)
            sa_ins_preds.append(li_cls)

        batch_dict["centers"] = centers
        batch_dict["centers_origin"] = centers_origin
        batch_dict["ctr_offsets"] = ctr_offsets
        # fp32 at the backbone boundary: heads consume fp32 features
        batch_dict["centers_features"] = enc_feats[-1].astype(jnp.float32)
        batch_dict["centers_valid"] = enc_valid[-1]
        batch_dict["encoder_coords"] = enc_xyz
        batch_dict["encoder_valid"] = enc_valid
        batch_dict["sa_ins_preds"] = sa_ins_preds
        # standard point-head interface
        batch_dict["point_coords"] = centers
        batch_dict["point_features"] = enc_feats[-1].astype(jnp.float32)
        batch_dict["point_valid"] = enc_valid[-1]
        return batch_dict
