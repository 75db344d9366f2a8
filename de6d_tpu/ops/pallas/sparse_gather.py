"""Pallas TPU kernel: slab-gather submanifold sparse convolution.

The XLA path (ops/sparse.py subm_conv_table) gathers (V, K, Cin)
neighbor rows by index — a random row gather whose rows are only
32-256 B, ~100x off DMA roofline on v5e (measured 17 ms of a 19.5 ms
layer at V=16k, K=27, C=32, B=4 — runs/sparse_probe_r5d.log).

This kernel exploits a structural property of the sort-based lookup
(ops/sparse.py lookup): sites are sorted by linear key, and a kernel
offset shifts every key by the same constant, so for a FIXED offset k
the neighbor index ``idx[:, k]`` is monotone non-decreasing in the
site index. The neighbors of any tile of T consecutive sites therefore
live in one CONTIGUOUS row range of the feature table, and the gather
becomes:

  1. per (site-tile, offset): one async DMA of an S-row slab starting
     at the tile's 8-aligned minimum neighbor row (precomputed in XLA);
  2. an in-VMEM one-hot (T, S) x (S, Cin) MXU matmul selects each
     site's row (misses select the zero pad row or fall outside the
     slab — both yield exact zeros);
  3. the conv contraction (T, Cin) x (Cin, Cout) accumulates over
     offsets in fp32 — the grouped (V, K, Cin) tensor never exists.

Exactness: requires every tile's neighbor spread (max hit row − lo8)
to be < S. The caller checks the spread in XLA and falls back to the
gather path otherwise (same contract as the binned-SA spill fallback,
ops/binned.py). The one-hot select is exact for bf16 features; fp32
features use HIGHEST precision (see canvas.py:57-64).

Replaces the gather+GEMM of reference spconv's submanifold conv
(core/pcdet/models/backbones_3d/spconv_backbone.py:69 via the spconv
library); the reference's CUDA hash-table+rulebook design has no TPU
analogue — this slab/one-hot formulation is the TPU-native shape of
the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(n_off: int, tile: int, slab: int, cin: int, cout: int,
                 groups: int):
    """groups = 128 // cin: feature rows are PACKED groups-per-128-lane
    row so the slab DMA slices full 128-lane rows (Mosaic requires
    lane slices aligned to the 128 tiling; a bare (slab, cin<128)
    slice is illegal on hardware). The one-hot select then works at
    packed-row granularity with the group membership folded into the
    one-hot, and the group extraction is folded into the second matmul
    via group-expanded weights (w_exp[k, j] has w[k] at lane rows
    j*cin:(j+1)*cin, zeros elsewhere) — no lane slicing anywhere."""
    pslab = slab // groups
    lg = groups.bit_length() - 1  # groups is a power of two

    def kernel(lo_ref, idx_ref, w_ref, feats_hbm, out_ref, buf, sems):
        b = pl.program_id(0)
        t = pl.program_id(1)
        iota_tp = jax.lax.broadcasted_iota(jnp.int32, (tile, pslab), 1)
        w_dtype = w_ref.dtype

        # lo_ref is the WHOLE (B, n_tiles, K) array in SMEM (a
        # (1, 1, K) block is not a legal Mosaic SMEM block when
        # n_tiles % 8 != 0 — scalar refs are indexed dynamically
        # by program id instead)
        def copy(k, slot):
            # lo is 8*groups-aligned, so the packed start is 8-aligned
            st = pl.multiple_of(lo_ref[b, t, k] >> lg, 8)
            return pltpu.make_async_copy(
                feats_hbm.at[b, pl.ds(st, pslab), :],
                buf.at[slot],
                sems.at[slot],
            )

        copy(0, 0).start()
        acc = jnp.zeros((tile, cout), jnp.float32)
        # one-hot rows are exact in bf16; fp32 feature tables need
        # HIGHEST or the MXU rounds the features through bf16
        prec = (
            jax.lax.Precision.HIGHEST
            if w_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        for k in range(n_off):
            slot = k % 2
            if k + 1 < n_off:
                copy(k + 1, (k + 1) % 2).start()
            copy(k, slot).wait()
            off = idx_ref[0, 0, k, :] - lo_ref[b, t, k]  # (T,)
            prow = off >> lg  # packed row
            grp = off & (groups - 1)  # lane-group within the row
            for j in range(groups):
                sel = (
                    (prow[:, None] == iota_tp) & (grp[:, None] == j)
                ).astype(w_dtype)  # (T, pslab)
                g = jax.lax.dot_general(
                    sel, buf[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32,
                )  # (T, 128) — only lanes j*cin:(j+1)*cin are wanted
                acc = acc + jax.lax.dot_general(
                    g.astype(w_dtype), w_ref[k * groups + j],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32,
                )  # w_exp zero rows outside the group kill the rest
        out_ref[0] = acc

    return kernel


def _groups_for(cin: int) -> int:
    """Packed rows per 128-lane row; 0 if the layout doesn't apply."""
    if cin <= 128 and 128 % cin == 0:
        return 128 // cin
    return 0


def _lo_align(groups: int) -> int:
    # packed DMA start must be 16-sublane aligned (covers the bf16
    # (16, 128) tiling; fp32 needs only 8)
    return 16 * groups


def slab_spread_ok(idx, hit, v: int, tile: int = 256, slab: int = 512,
                   cin: int = 128):
    """(B, Q, K) neighbor table → (B,) bool: every site-tile's neighbor
    rows fit an S-row slab starting at the tile's aligned minimum
    (the subm_conv_slab exactness condition, same tile/slab defaults;
    ``cin`` sets the packed-row alignment and must match the feature
    width passed to subm_conv_slab). ``v`` is the FEATURE-TABLE row
    count (Q may differ — strided convs query output sites against
    the input table)."""
    b, q, k3 = idx.shape
    align = _lo_align(max(_groups_for(cin), 1))
    q_pad = _round_up(q, tile)
    idxm = jnp.where(hit, idx, v).astype(jnp.int32)
    if q_pad != q:
        idxm = jnp.pad(
            idxm, ((0, 0), (0, q_pad - q), (0, 0)), constant_values=v
        )
    til = idxm.reshape(b, q_pad // tile, tile, k3)
    lo = jnp.min(til, axis=2)
    lo8 = jnp.clip((lo // align) * align, 0, v)
    hi = jnp.max(jnp.where(til < v, til, 0), axis=2)
    return jnp.all((hi - lo8 < slab) | (lo >= v), axis=(1, 2))


@functools.partial(
    jax.jit, static_argnames=("tile", "slab", "interpret")
)
def subm_conv_slab(features, idx, hit, weights, valid,
                   tile: int = 256, slab: int = 512,
                   interpret: bool = False):
    """Sparse conv gather+GEMM via slab DMA + one-hot select.

    features (B, V, Cin) key-sorted table; idx/hit (B, Q, K) neighbor
    table (from sparse.subm_neighbor_table, or a strided layer's
    per-output-site lookup — Q need not equal V); weights
    (K, Cin, Cout); valid (B, Q) OUTPUT-site validity. Returns
    (out (B, Q, Cout), ok (B,) bool) where ``ok[b]`` certifies
    exactness (every tile spread < slab); rows of samples with
    ok=False are UNDEFINED — callers must fall back.
    """
    b, v, cin = features.shape
    q = idx.shape[1]
    k3 = idx.shape[-1]
    cout = weights.shape[-1]
    q_pad = _round_up(q, tile)
    n_tiles = q_pad // tile
    groups = _groups_for(cin)
    if groups == 0:
        raise ValueError(f"cin={cin} must divide 128 for the packed "
                         "slab layout")
    align = _lo_align(groups)
    assert slab % groups == 0

    # miss -> row v (a zero row): selects zero whether it lands inside
    # the slab or beyond it
    idxm = jnp.where(hit, idx, v).astype(jnp.int32)
    if q_pad != q:
        idxm = jnp.pad(idxm, ((0, 0), (0, q_pad - q), (0, 0)),
                       constant_values=v)
    til = idxm.reshape(b, n_tiles, tile, k3)
    lo = jnp.min(til, axis=2)  # (B, n_tiles, K)
    # DMA starts must be aligned at packed-row granularity
    lo8 = jnp.clip((lo // align) * align, 0, v)
    hi = jnp.max(jnp.where(til < v, til, 0), axis=2)
    ok = jnp.all((hi - lo8 < slab) | (lo >= v), axis=(1, 2))  # (B,)

    w_dtype = features.dtype
    # zero-pad so every slab read is in-bounds, then pack `groups`
    # feature rows per 128-lane row (Mosaic: lane slices must cover
    # the full 128 tiling — a (slab, cin<128) DMA slice is illegal)
    rows = _round_up(v + slab + align, groups)
    feats_z = jnp.concatenate(
        [features, jnp.zeros((b, rows - v, cin), features.dtype)],
        axis=1,
    ).reshape(b, rows // groups, groups * cin)
    idx_t = jnp.swapaxes(idxm, 1, 2)  # (B, K, Vpad)
    idx_t = idx_t.reshape(b, k3, n_tiles, tile).swapaxes(1, 2)
    # (B, n_tiles, K, tile)

    # group-expanded weights: w_exp[k*G+j] is (128, cout) with w[k]
    # at lane rows j*cin:(j+1)*cin and zeros elsewhere, so the group
    # extraction happens inside the conv matmul (no lane slicing)
    w_c = weights.astype(w_dtype)
    eye = jnp.eye(groups, dtype=w_dtype)
    w_exp = (
        eye[None, :, :, None, None] * w_c[:, None, None, :, :]
    ).reshape(k3 * groups, groups * cin, cout)

    out = pl.pallas_call(
        _make_kernel(k3, tile, slab, cin, cout, groups),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (b, n_tiles, k3), lambda bb, t: (0, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, k3, tile), lambda bb, t: (bb, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k3 * groups, groups * cin, cout),
                lambda bb, t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # ANY-space blocks must be the full array with a trivial
            # index map (Mosaic); the kernel slices by dynamic DMA
            pl.BlockSpec(
                (b, rows // groups, groups * cin),
                lambda bb, t: (0, 0, 0),
                memory_space=pl.ANY,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, cout), lambda bb, t: (bb, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, slab // groups, groups * cin), w_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(lo8, idx_t, w_exp, feats_z)
    out = out[:, :q].astype(features.dtype)
    return jnp.where(valid[..., None], out, 0.0), ok
