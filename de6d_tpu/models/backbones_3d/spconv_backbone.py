"""Sparse voxel backbones (SECOND / VoxelRCNN family).

Parity: reference backbones_3d/spconv_backbone.py — VoxelBackBone8x
(:69: 4-stage submanifold+strided sparse conv, 8× downsample, final
(3,1,1)-kernel z-strided conv to 'encoded_spconv_tensor') and
VoxelResBackBone8x (:183: residual SparseBasicBlock variant). Emits
multi_scale_3d_features for the PV-RCNN/Voxel-RCNN heads.

TPU design: sparse conv = keyed gather + one fused GEMM per layer
(ops/sparse.py); per-sample site lists with static caps, vmapped over
the batch with shared weights; BatchNorm is mask-aware (statistics
over active sites only — spconv's BN sees only active rows).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import sparse
from ...registry import BACKBONES_3D
from ..model_utils.dtype_utils import compute_dtype


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool):
        """x (..., C); mask (...,) — stats over masked rows only."""
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # stats/normalize in fp32 under bf16
        if train:
            w = mask.astype(x.dtype)[..., None]
            cnt = jnp.clip(jnp.sum(w), 1.0, None)
            mean = jnp.sum(x * w, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum(w * (x - mean) ** 2, axis=tuple(range(x.ndim - 1)))
                / cnt
            )
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mean
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(in_dtype)


class SubMConvLayer(nn.Module):
    out_channels: int
    kernel: tuple = (3, 3, 3)
    use_relu: bool = True

    @nn.compact
    def __call__(self, feats, keys, grid, train: bool, table=None):
        """feats (B, V, Cin), keys (B, V) sorted → (B, V, Cout).

        ``table`` is an optional precomputed (idx, hit) neighbor table
        from sparse.subm_neighbor_table — it depends only on the key
        set, so the backbone builds it once per resolution and every
        subm layer at that resolution reuses it (the lookup is the
        dominant cost of a layer: runs/sparse_probe_r5.log).

        Inference on TPU uses the Pallas slab-gather conv
        (ops/pallas/sparse_gather.py) when every tile's neighbor
        spread fits the slab (checked in-graph, exact fallback to the
        XLA gather otherwise); training keeps the XLA path (the slab
        kernel has no VJP)."""
        cin = feats.shape[-1]
        k3 = int(np.prod(self.kernel))
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k3, cin, self.out_channels),
        )
        wc = w.astype(feats.dtype)  # fp32 params, bf16-capable compute
        mask = keys != sparse.INVALID
        if table is not None:
            def xla_path(_):
                return jax.vmap(
                    lambda f, ti, th, m: sparse.subm_conv_table(
                        f, ti, th, wc, m
                    )
                )(feats, table[0], table[1], mask)

            if (
                not train
                and k3 == 27
                and jax.default_backend() == "tpu"
                and os.environ.get("DE6D_SLAB_CONV", "0") == "1"
            ):
                # DE6D_SLAB_CONV=1 opt-in: the slab kernel's feature
                # DMA is lane-misaligned for Cin < 128 on real TPU
                # (Mosaic "slice along dim 2 must be aligned to 128";
                # interpret mode cannot catch it) and each Mosaic
                # instance costs ~60 s through the tunnel. Off until
                # the packed-row layout lands; the XLA gather path
                # below is the measured default (SECOND 24.3 scans/s).
                from ...ops.pallas.sparse_gather import (
                    slab_spread_ok, subm_conv_slab,
                )

                def slab_path(_):
                    out, _ = subm_conv_slab(
                        feats, table[0], table[1], w, mask
                    )
                    return out

                ok = slab_spread_ok(table[0], table[1], feats.shape[1], cin=feats.shape[-1])
                out = jax.lax.cond(
                    jnp.all(ok), slab_path, xla_path, None
                )
            else:
                out = xla_path(None)
        else:
            out = jax.vmap(
                lambda f, k: sparse.subm_conv(f, k, grid, wc, self.kernel)
            )(feats, keys)
        out = MaskedBatchNorm()(out, mask, train)
        return nn.relu(out) if self.use_relu else out


class SparseDownLayer(nn.Module):
    out_channels: int
    kernel: tuple = (3, 3, 3)
    stride: tuple = (2, 2, 2)
    padding: tuple = (1, 1, 1)
    max_out: int = 16000

    @nn.compact
    def __call__(self, feats, keys, grid, train: bool):
        """Returns (out_feats (B, Q, Cout), out_keys (B, Q), out_grid)."""
        cin = feats.shape[-1]
        k3 = int(np.prod(self.kernel))
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k3, cin, self.out_channels),
        )

        wc = w.astype(feats.dtype)

        _, out_grid = sparse.downsample_coords(
            keys[0], grid, self.stride, self.padding, self.max_out,
            kernel=self.kernel,
        )
        out_keys = jax.vmap(
            lambda k: sparse.downsample_coords(
                k, grid, self.stride, self.padding, self.max_out,
                kernel=self.kernel,
            )[0]
        )(keys)
        mask = out_keys != sparse.INVALID
        k3_full = int(np.prod(self.kernel))
        if (
            not train
            and k3_full == 27
            and jax.default_backend() == "tpu"
        ):
            # eval on TPU: factored lookup table + Pallas slab gather
            # (same idx-monotonicity as the subm case; exact fallback)
            from ...ops.pallas.sparse_gather import (
                slab_spread_ok, subm_conv_slab,
            )

            ti, th = jax.vmap(
                lambda k, ok_: sparse.strided_neighbor_table(
                    k, ok_, grid, out_grid, self.kernel, self.stride,
                    self.padding,
                )
            )(keys, out_keys)

            def slab_path(_):
                o, _ = subm_conv_slab(feats, ti, th, w, mask)
                return o

            def xla_path(_):
                return jax.vmap(
                    lambda f, tii, thh, m: sparse.subm_conv_table(
                        f, tii, thh, wc, m
                    )
                )(feats, ti, th, mask)

            if os.environ.get("DE6D_SLAB_CONV", "0") == "1":
                # same opt-in gate as SubMConvLayer: the slab DMA is
                # lane-misaligned for Cin < 128 on real TPU
                ok = slab_spread_ok(ti, th, feats.shape[1], cin=feats.shape[-1])
                out = jax.lax.cond(
                    jnp.all(ok), slab_path, xla_path, None
                )
            else:
                out = xla_path(None)
        else:
            out = jax.vmap(
                lambda f, k, ok_: sparse.strided_conv(
                    f, k, grid, wc, self.kernel, self.stride,
                    self.padding, ok_, out_grid,
                )
            )(feats, keys, out_keys)
        out = MaskedBatchNorm()(out, mask, train)
        return nn.relu(out), out_keys, out_grid


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (reference SparseBasicBlock
    :30)."""

    channels: int

    @nn.compact
    def __call__(self, feats, keys, grid, train: bool, table=None):
        identity = feats
        out = SubMConvLayer(self.channels)(feats, keys, grid, train, table)
        out = SubMConvLayer(self.channels, use_relu=False)(
            out, keys, grid, train, table
        )
        return nn.relu(out + identity)


class _VoxelBackboneBase(nn.Module):
    model_cfg: dict
    input_channels: int
    grid_size: tuple  # (nx, ny, nz)
    residual: bool = False

    def _stage(self, channels, n_blocks):
        if self.residual:
            return [SparseBasicBlock(channels) for _ in range(n_blocks)]
        return [SubMConvLayer(channels) for _ in range(n_blocks)]

    @nn.compact
    def __call__(self, batch_dict, train: bool = False):
        return self._encode(batch_dict, train)

    def _encode(self, batch_dict, train: bool = False):
        """Encoder body — a plain helper so subclasses (UNetV2) can
        extend it inside their own compact __call__ (flax allows only
        one @compact method per class)."""
        feats = batch_dict["voxel_features"]  # (B, V, C)
        coords = batch_dict["voxel_coords"]  # (B, V, 3) zyx
        nx, ny, nz = (
            int(self.grid_size[0]), int(self.grid_size[1]),
            int(self.grid_size[2]),
        )
        grid = (nz + 1, ny, nx)  # +1 z pad (reference sparse_shape +[1,0,0])
        v = feats.shape[1]

        valid = coords[..., 0] >= 0
        keys = jax.vmap(
            lambda c, m: sparse.coords_to_keys(c, grid, m)
        )(coords, valid)
        # sort sites by key so lookups can binary-search
        def sort_one(f, k):
            return sparse.sort_sparse(f, k)

        feats, keys = jax.vmap(sort_one)(feats, keys)
        feats = feats.astype(compute_dtype(self.model_cfg))

        nf = self.model_cfg.get("NUM_FILTERS", [16, 16, 32, 64, 64])
        caps = self.model_cfg.get(
            "MAX_VOXELS_PER_STAGE", [v, v, v // 2, v // 4]
        )

        def table_for(ks, gr):
            return jax.vmap(
                lambda k: sparse.subm_neighbor_table(k, gr)
            )(ks)

        tab = table_for(keys, grid)
        x = SubMConvLayer(nf[0])(feats, keys, grid, train, tab)  # conv_input
        for blk in self._stage(nf[1], 1):
            x = blk(x, keys, grid, train, tab)
        ms = {"x_conv1": (x, keys, grid)}

        x, keys2, grid2 = SparseDownLayer(nf[2], max_out=caps[1])(
            x, keys, grid, train
        )
        tab = table_for(keys2, grid2)
        for blk in self._stage(nf[2], 2):
            x = blk(x, keys2, grid2, train, tab)
        ms["x_conv2"] = (x, keys2, grid2)

        x, keys3, grid3 = SparseDownLayer(nf[3], max_out=caps[2])(
            x, keys2, grid2, train
        )
        tab = table_for(keys3, grid3)
        for blk in self._stage(nf[3], 2):
            x = blk(x, keys3, grid3, train, tab)
        ms["x_conv3"] = (x, keys3, grid3)

        x, keys4, grid4 = SparseDownLayer(
            nf[4], padding=(0, 1, 1), max_out=caps[3]
        )(x, keys3, grid3, train)
        tab = table_for(keys4, grid4)
        for blk in self._stage(nf[4], 2):
            x = blk(x, keys4, grid4, train, tab)
        ms["x_conv4"] = (x, keys4, grid4)

        out_ch = self.model_cfg.get("OUT_CHANNELS", 128)
        x, keys5, grid5 = SparseDownLayer(
            out_ch, kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0),
            max_out=caps[3],
        )(x, keys4, grid4, train)

        dense = jax.vmap(lambda f, k: sparse.to_dense(f, k, grid5))(
            x, keys5
        ).astype(jnp.float32)  # (B, nz5, ny5, nx5, C)
        batch_dict["encoded_spconv_tensor"] = dense
        batch_dict["encoded_spconv_tensor_stride"] = 8
        batch_dict["multi_scale_3d_features"] = ms
        batch_dict["multi_scale_3d_strides"] = {
            "x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8,
        }
        return batch_dict


@BACKBONES_3D.register
class VoxelBackBone8x(_VoxelBackboneBase):
    residual: bool = False


@BACKBONES_3D.register
class VoxelResBackBone8x(_VoxelBackboneBase):
    residual: bool = True
