"""Pallas TPU kernel: sorted-pillar scatter to a dense BEV canvas.

Replaces the XLA id-scatter + row-gather canvas build in
PointPillarScatter (reference pointpillar_scatter.py:14-37): an XLA
gather of ~214k feature rows by cell id lowers to serialized dynamic
slices and costs ~1.8 ms/scan on v5e — the single largest stage of the
PointPillars inference pipeline.

The kernel exploits the voxelizer's key-sorted pillar order
(ops/voxelize.py): pillar ids are assigned in ascending linear-cell
order, so the pillars landing in any tile of T consecutive canvas
cells form a CONTIGUOUS id range of length <= T. Each grid step
therefore:

  1. DMAs two T-row blocks of the (1+V, C) feature table, starting at
     the scalar-prefetched block index of the tile's first live pillar
     (two blocks cover any T+1-row range at block granularity);
  2. resolves the per-cell row as a (T, 2T) one-hot matmul against the
     (2T, C) local buffer — MXU work, no dynamic gather;
  3. masks cells that own no pillar to zero.

Per-cell gather rows `s` (a segmented cummax of 1-based pillar ids)
and ownership flags are precomputed with cheap vectorized XLA.

Cost: the one-hot matmul is g * 2*tile * C MACs/scan (linear in the
tile size) + a pure-bandwidth canvas write. Measured on v5e at KITTI
PointPillars scale (432x496x64 canvas, 16k pillars, bf16, batch 8):
2.08 ms/scan XLA id-scatter+gather -> 0.71 ms/scan at tile=256
(1.03 at 512, 1.18 at 1024, 0.83 at 128 — smaller tiles cut matmul
FLOPs linearly until grid-step overhead wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _canvas_kernel(lo_blk_ref, s_ref, t_ref, blk0_ref, blk1_ref, out_ref,
                   *, tile: int):
    b = pl.program_id(0)
    k = pl.program_id(1)
    # s/t are whole per-batch (n_tiles, T) planes (a (1,1,T) block would
    # violate the TPU sublane rule); slice this grid step's tile row
    sv = s_ref[0, k, :]  # (T,) int32 — 1-based gather row per cell
    tv = t_ref[0, k, :]  # (T,) int32 — >0 iff the cell owns a pillar
    off = sv - lo_blk_ref[b, k] * tile  # in [0, 2T)
    buf = jnp.concatenate([blk0_ref[0], blk1_ref[0]], axis=0)  # (2T, C)
    onehot = (
        off[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (tile, 2 * tile), 1)
    ).astype(buf.dtype)
    # The MXU's default precision multiplies in bf16. One-hot rows are
    # exact in bf16, so bf16 tables select exactly; fp32 tables need
    # HIGHEST to avoid rounding the features themselves.
    prec = (
        jax.lax.Precision.HIGHEST
        if buf.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    rows = jnp.dot(
        onehot, buf, preferred_element_type=jnp.float32, precision=prec
    )
    # compare AFTER the minor-dim insert: Mosaic only supports the
    # (T,) -> (T, 1) reshape for 32-bit types, not i1
    out_ref[0] = jnp.where(
        tv[:, None] > 0, rows, 0.0
    ).astype(out_ref.dtype)


def _local_cummax(x):
    """Inclusive cummax along axis -1 by log-doubling shifts (axis len
    must be a power of two); avoids lax.associative_scan's odd/even
    decomposition, which lowers to strided slices that crawl on TPU."""
    n = x.shape[-1]
    sh = 1
    while sh < n:
        shifted = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(sh, 0)])[..., :-sh]
        x = jnp.maximum(x, shifted)
        sh *= 2
    return x


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
@functools.partial(
    jax.jit, static_argnames=("ny", "nx", "tile", "interpret")
)
def scatter_canvas(feat, lin, ny: int, nx: int, tile: int = 256,
                   interpret: bool = False):
    """(B, V, C) pillar features + (B, V) SORTED unique linear cell ids
    (>= ny*nx marks invalid slots; valid ids form an ascending prefix)
    -> (B, ny, nx, C) dense canvas.
    """
    bsz, v, c = feat.shape
    g = ny * nx
    n_tiles = pl.cdiv(g, tile)
    g_pad = n_tiles * tile

    # t[cell] = 1-based pillar id owning the cell (0 = none). The only
    # scatter left is (V,) int32 — tiny next to feature-row scatters.
    idx1 = jnp.broadcast_to(
        jnp.arange(1, v + 1, dtype=jnp.int32)[None, :], (bsz, v)
    )
    lin_c = jnp.where(lin < g, lin, g_pad)  # out-of-range -> dropped

    def t_one(l, i):
        return (
            jnp.zeros((g_pad,), jnp.int32)
            .at[l]
            .set(i, mode="drop", unique_indices=True,
                 indices_are_sorted=True)
        )

    t = jax.vmap(t_one)(lin_c, idx1)  # (B, g_pad)
    t2 = t.reshape(bsz, n_tiles, tile)
    local = _local_cummax(t2)  # (B, n_tiles, tile)
    tile_max = local[..., -1]  # (B, n_tiles)
    lo_excl = jnp.pad(
        _local_cummax(tile_max)[:, :-1], ((0, 0), (1, 0))
    )  # (B, n_tiles) — highest pillar id before the tile
    s2 = jnp.maximum(local, lo_excl[..., None])  # gather row per cell
    lo_blk = lo_excl // tile  # (B, n_tiles) table block of the range

    # feature table with a leading zero row; padded so block lo_blk+1
    # always exists
    tbl_rows = (pl.cdiv(1 + v, tile) + 1) * tile
    table = jnp.concatenate(
        [
            jnp.zeros((bsz, 1, c), feat.dtype),
            feat,
            jnp.zeros((bsz, tbl_rows - 1 - v, c), feat.dtype),
        ],
        axis=1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, n_tiles, tile), lambda b, k, lo: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_tiles, tile), lambda b, k, lo: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, c), lambda b, k, lo: (b, lo[b, k], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, c), lambda b, k, lo: (b, lo[b, k] + 1, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c), lambda b, k, lo: (b, k, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_canvas_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, g_pad, c), feat.dtype),
        interpret=interpret,
    )(lo_blk, s2, t2, table, table)
    return out[:, :g].reshape(bsz, ny, nx, c)


def _scatter_canvas_fwd(feat, lin, ny, nx, tile, interpret):
    return scatter_canvas(feat, lin, ny, nx, tile, interpret), lin


def _scatter_canvas_bwd(ny, nx, tile, interpret, lin, ct):
    # d feat[b, v] = d canvas[b, cell(v)] for valid slots — a (B, V)-row
    # gather from the cotangent, ~13x fewer rows than the forward's
    # per-cell work, so plain XLA is fine here.
    bsz, v = lin.shape
    g = ny * nx
    c = ct.shape[-1]
    flat = ct.reshape(bsz, g, c)
    safe = jnp.minimum(lin, g - 1)
    rows = jnp.take_along_axis(flat, safe[..., None], axis=1)
    d_feat = jnp.where((lin < g)[..., None], rows, 0.0).astype(ct.dtype)
    return d_feat, None


scatter_canvas.defvjp(_scatter_canvas_fwd, _scatter_canvas_bwd)
