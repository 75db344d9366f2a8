"""Point-based backbones.

Parity: reference backbones_3d/pointnet2_backbone.py —
- PointNet2MSG (:9-94): SA stack + FP stack (PointRCNN),
- PointNet2FSMSG (:97-263): SASA fusion-sampling backbone emitting
  per-layer coords/scores for the SASA loss and (optionally) no FP.

TPU-first: the reference flattens batches into ragged (N, 4) tensors
with a batch-idx column and asserts equal per-sample counts
(:219); here everything stays batched (B, N, …) with validity masks.
batch_dict point keys:
  point_coords   (B, N, 3)      [reference: (B·N, 4) bs-idx column]
  point_features (B, N, C)
  point_valid    (B, N)
  point_scores   (B, N) or None
  point_coords_list / point_scores_list / point_valid_list: per-SA-layer
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...registry import BACKBONES_3D
from ..model_utils.dtype_utils import compute_dtype
from .pointnet2_modules import (
    PointnetFPModule, PointnetSAModuleFSMSG,
)


def _build_sa_stack(model_cfg, input_channels):
    """Construct configuration tuples for the SA stack from SA_CONFIG.
    Returns list of kwargs dicts + per-layer output channels."""
    sa_cfg = model_cfg["SA_CONFIG"]
    use_xyz = sa_cfg.get("USE_XYZ", True)
    dilated = sa_cfg.get("DILATED_RADIUS_GROUP", False)
    skip = sa_cfg.get("SKIP_CONNECTION", False)
    gamma = sa_cfg.get("WEIGHT_GAMMA", 1.0)
    agg_mlps = sa_cfg.get("AGGREGATION_MLPS", None)
    conf_mlps = sa_cfg.get("CONFIDENCE_MLPS", None)

    # legacy plain-MSG keys (PointNet2MSG): NPOINTS/RADIUS/NSAMPLE
    if "NPOINT_LIST" in sa_cfg:
        npoint_lists = sa_cfg["NPOINT_LIST"]
        range_lists = sa_cfg["SAMPLE_RANGE_LIST"]
        method_lists = sa_cfg["SAMPLE_METHOD_LIST"]
    else:
        npoint_lists = [[int(x)] for x in sa_cfg["NPOINTS"]]
        range_lists = [[[0, -1]] for _ in sa_cfg["NPOINTS"]]
        method_lists = [["d-fps"] for _ in sa_cfg["NPOINTS"]]

    binned_cap = (
        int(sa_cfg.get("BIN_CELL_CAP", 128))
        if sa_cfg.get("BINNED_QUERY", True) else 0
    )
    spill_cap = int(sa_cfg.get("BIN_SPILL_CAP", 256))

    layers = []
    channel_in = input_channels - 3
    skip_channels = [channel_in]
    for k in range(len(npoint_lists)):
        mlps = [list(m) for m in sa_cfg["MLPS"][k]]
        channel_out = sum(m[-1] for m in mlps)
        if skip:
            channel_out += channel_in
        agg = tuple(agg_mlps[k]) if agg_mlps and agg_mlps[k] else ()
        if agg:
            channel_out = agg[-1]
        conf = tuple(conf_mlps[k]) if conf_mlps and conf_mlps[k] else ()
        layers.append(
            dict(
                npoint_list=tuple(int(x) for x in npoint_lists[k]),
                sample_range_list=tuple(
                    tuple(int(v) for v in r) for r in range_lists[k]
                ),
                sample_method_list=tuple(method_lists[k]),
                radii=tuple(float(r) for r in sa_cfg["RADIUS"][k]),
                nsamples=tuple(int(s) for s in sa_cfg["NSAMPLE"][k]),
                mlps=tuple(tuple(m) for m in mlps),
                use_xyz=use_xyz,
                dilated_radius_group=dilated,
                skip_connection=skip,
                weight_gamma=float(gamma),
                aggregation_mlp=agg,
                confidence_mlp=conf,
                bin_cell_cap=binned_cap,
                bin_spill_cap=spill_cap,
            )
        )
        skip_channels.append(channel_out)
        channel_in = channel_out
    return layers, skip_channels, channel_out


class _PointNet2Base(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple = (0, 0, 0)
    point_cloud_range: tuple = ()  # enables the binned ball query

    def setup(self):
        dt = compute_dtype(self.model_cfg)
        layers, skip_channels, channel_out = _build_sa_stack(
            self.model_cfg, self.input_channels
        )
        self.sa_modules = [
            PointnetSAModuleFSMSG(
                dtype=dt, pc_range=tuple(self.point_cloud_range), **kw
            )
            for kw in layers
        ]
        self._skip_channels = skip_channels
        self.num_point_features = channel_out

        fp_mlps = self.model_cfg.get("FP_MLPS", None)
        if fp_mlps:
            # flax Dense infers input width, so only the output channel
            # lists matter (reference prepends the concat width)
            self.fp_modules = [
                PointnetFPModule(mlp=tuple(m), dtype=dt) for m in fp_mlps
            ]
            self.num_point_features = fp_mlps[0][-1]
        else:
            self.fp_modules = None

    def run_backbone(self, batch_dict, train: bool):
        points = batch_dict["points"]  # (B, N, 3+C)
        valid = batch_dict.get(
            "points_mask", jnp.any(points[..., :3] != 0, axis=-1)
        )
        xyz = points[..., :3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_features, l_scores, l_valid = (
            [xyz], [features], [None], [valid]
        )
        for sa in self.sa_modules:
            nxyz, nfeat, nscores, nvalid = sa(
                l_xyz[-1], l_features[-1], l_valid[-1],
                scores=l_scores[-1], train=train,
            )
            l_xyz.append(nxyz)
            l_features.append(nfeat)
            l_scores.append(nscores)
            l_valid.append(nvalid)

        batch_dict["point_coords_list"] = l_xyz[1:]
        batch_dict["point_scores_list"] = l_scores[1:]
        batch_dict["point_valid_list"] = l_valid[1:]

        if self.fp_modules is not None:
            for i in range(-1, -(len(self.fp_modules) + 1), -1):
                l_features[i - 1] = self.fp_modules[i](
                    l_xyz[i - 1], l_xyz[i], l_features[i - 1],
                    l_features[i], l_valid[i], train=train,
                )
            out = i - 1
        else:
            out = -1

        batch_dict["point_coords"] = l_xyz[out]
        # heads consume fp32 features; SA/FP compute may have run bf16
        batch_dict["point_features"] = l_features[out].astype(jnp.float32)
        batch_dict["point_valid"] = l_valid[out]
        batch_dict["point_scores"] = l_scores[-1]
        return batch_dict


@BACKBONES_3D.register
class PointNet2MSG(_PointNet2Base):
    """SA + FP backbone (PointRCNN)."""

    def __call__(self, batch_dict, train: bool = False):
        return self.run_backbone(batch_dict, train)


@BACKBONES_3D.register
class PointNet2FSMSG(_PointNet2Base):
    """Fusion-sampling SA backbone (SASA / Det6D)."""

    def __call__(self, batch_dict, train: bool = False):
        return self.run_backbone(batch_dict, train)
