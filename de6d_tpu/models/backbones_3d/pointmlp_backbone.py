"""PointMLP backbone (arXiv:2202.07123).

Parity: reference backbones_3d/pointmlp_backbone.py:1-451 +
model_utils/pointmlp_utils.py: embedding → per-stage
[LocalGrouper (FPS + kNN + geometric-affine normalize) →
PreExtraction (channel transfer + residual MLP blocks + neighbor max)
→ PosExtraction (residual MLP blocks)] → FP decoder
(inverse-distance 3-NN interpolation + fuse + residual blocks).

TPU-first: padded (B, N) shapes with validity masks; kNN is a dense
masked top-k; the reference's Conv1d stacks are Dense layers over the
channel-last layout (identical math, MXU-friendly).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sampling
from ...registry import BACKBONES_3D


def _act(name):
    return {
        "gelu": nn.gelu, "silu": nn.silu, "relu": nn.relu,
        "leakyrelu": nn.leaky_relu,
    }.get(str(name).lower(), nn.relu)


class ConvBNAct(nn.Module):
    channels: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.channels)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )(x)
        return _act(self.activation)(x)


class ResBlock(nn.Module):
    """ConvBNReLURes1D (reference :123-152), res_expansion=1."""

    channels: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool):
        a = _act(self.activation)
        y = nn.Dense(self.channels)(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )(y)
        y = a(y)
        y = nn.Dense(self.channels)(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )(y)
        return a(y + x)


def knn_point(k, xyz, new_xyz, valid=None):
    """(B, N, 3), (B, M, 3) → (B, M, k) nearest-neighbor indices
    (reference pointmlp_utils.knn_point)."""
    d2 = jnp.sum(
        (new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1
    )  # (B, M, N)
    if valid is not None:
        d2 = jnp.where(valid[:, None, :], d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


class LocalGrouper(nn.Module):
    """FPS centers + kNN groups + geometric-affine normalization
    (reference :33-108, normalize='anchor')."""

    channel: int
    groups: int
    kneighbors: int
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool):
        b = xyz.shape[0]
        fps_idx = sampling.farthest_point_sample(xyz, self.groups, valid)
        new_xyz = sampling.gather_points(xyz, fps_idx)
        new_feats = sampling.gather_points(feats, fps_idx)
        new_valid = jnp.take_along_axis(valid, fps_idx, axis=1)

        idx = knn_point(self.kneighbors, xyz, new_xyz, valid)  # (B,M,k)
        flat = idx.reshape(b, -1)
        g_xyz = jnp.take_along_axis(
            xyz, flat[..., None], axis=1
        ).reshape(b, self.groups, self.kneighbors, 3)
        g_feat = jnp.take_along_axis(
            feats, flat[..., None], axis=1
        ).reshape(b, self.groups, self.kneighbors, -1)
        if self.use_xyz:
            g_feat = jnp.concatenate([g_feat, g_xyz], axis=-1)

        dim = self.channel + (3 if self.use_xyz else 0)
        alpha = self.param(
            "affine_alpha", nn.initializers.ones, (1, 1, 1, dim)
        )
        beta = self.param(
            "affine_beta", nn.initializers.zeros, (1, 1, 1, dim)
        )
        anchor = (
            jnp.concatenate([new_feats, new_xyz], axis=-1)
            if self.use_xyz else new_feats
        )[:, :, None, :]
        diff = g_feat - anchor
        std = jnp.std(diff.reshape(b, -1), axis=-1)[:, None, None, None]
        g_feat = diff / (std + 1e-5)
        g_feat = alpha * g_feat + beta

        rep = jnp.broadcast_to(
            new_feats[:, :, None, :],
            g_feat.shape[:3] + (new_feats.shape[-1],),
        )
        out = jnp.concatenate([g_feat, rep], axis=-1)
        return new_xyz, out, new_valid


class PreExtraction(nn.Module):
    """Transfer + residual blocks per (group, neighbor) + neighbor max
    (reference :154-187)."""

    out_channels: int
    blocks: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, M, K, C)
        x = ConvBNAct(self.out_channels, self.activation)(x, train)
        for _ in range(self.blocks):
            x = ResBlock(self.out_channels, self.activation)(x, train)
        return jnp.max(x, axis=2)  # (B, M, C)


class PosExtraction(nn.Module):
    blocks: int
    channels: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.blocks):
            x = ResBlock(self.channels, self.activation)(x, train)
        return x


class FPBlock(nn.Module):
    """Inverse-distance 3-NN interpolation + fuse + residual blocks
    (reference PointNetFeaturePropagation :210-263)."""

    out_channel: int
    blocks: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2, valid2, train: bool):
        idx = knn_point(3, xyz2, xyz1, valid2)  # (B, N, 3)
        b, n, _ = idx.shape
        d = jnp.sqrt(jnp.clip(jnp.sum(
            (xyz1[:, :, None, :] - jnp.take_along_axis(
                xyz2, idx.reshape(b, -1)[..., None], axis=1
            ).reshape(b, n, 3, 3)) ** 2, axis=-1,
        ), 0.0, None))
        w = 1.0 / (d + 1e-8)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        f3 = jnp.take_along_axis(
            feats2, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b, n, 3, -1)
        interp = jnp.sum(f3 * w[..., None], axis=2)
        if feats1 is not None:
            interp = jnp.concatenate([feats1, interp], axis=-1)
        x = ConvBNAct(self.out_channel, self.activation)(interp, train)
        return PosExtraction(
            self.blocks, self.out_channel, self.activation
        )(x, train)


@BACKBONES_3D.register
class PointMLPBackBone(nn.Module):
    model_cfg: dict
    input_channels: int = 4
    grid_size: tuple = (0, 0, 0)

    @property
    def num_point_features(self):
        return int(self.model_cfg["DECODER"]["MLPS"][-1])

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        cfg = self.model_cfg
        enc = cfg["ENCODER"]
        points = batch_dict["points"]
        valid = batch_dict.get(
            "points_mask", jnp.ones(points.shape[:2], bool)
        )
        xyz = points[..., :3]

        feat = ConvBNAct(int(cfg["EMBED"]))(xyz, train)
        xyz_list, feat_list, valid_list = [xyz], [feat], [valid]

        in_ch = int(cfg["EMBED"])
        for i in range(len(enc["NPOINTS"])):
            out_ch = int(enc["PRE_EXTRACTION"]["MLPS"][i])
            xyz, grouped, valid = LocalGrouper(
                channel=in_ch,
                groups=int(enc["NPOINTS"][i]),
                kneighbors=int(enc["PRE_EXTRACTION"]["KNN"][i]),
            )(xyz, feat, valid, train)
            feat = PreExtraction(
                out_ch, int(enc["PRE_EXTRACTION"]["RES_BLOCK"][i])
            )(grouped, train)
            feat = PosExtraction(
                int(enc["POS_EXTRACTION"]["RES_BLOCK"][i]), out_ch
            )(feat, train)
            xyz_list.append(xyz)
            feat_list.append(feat)
            valid_list.append(valid)
            in_ch = out_ch

        dec_mlps = list(cfg["DECODER"]["MLPS"])
        dec_blocks = list(cfg["DECODER"]["RES_BLOCK"])
        feat = feat_list[-1]
        for i in range(len(dec_mlps)):
            lvl = len(xyz_list) - 1 - i  # fine level index - 1
            feat = FPBlock(
                int(dec_mlps[i]), int(dec_blocks[i])
            )(
                xyz_list[lvl - 1], xyz_list[lvl],
                feat_list[lvl - 1], feat, valid_list[lvl], train,
            )

        batch_dict["point_features"] = feat
        batch_dict["point_coords"] = xyz_list[0]
        batch_dict["point_valid"] = valid_list[0]
        return batch_dict
