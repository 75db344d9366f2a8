"""Pallas BEV-canvas kernel (ops/pallas/canvas.py) vs the XLA
id-scatter + gather reference build (the PointPillarScatter fallback
path), run in interpret mode on CPU.

Parity target: reference pointpillar_scatter.py:14-37 semantics —
each pillar's feature row lands at its (y, x) cell; empty cells are
zero."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from de6d_tpu.ops.pallas.canvas import scatter_canvas  # noqa: E402


def _ref_canvas(feat, lin, ny, nx):
    g = ny * nx
    v = feat.shape[0]
    ids = jnp.full((g + 1,), v, jnp.int32).at[lin].set(
        jnp.arange(v, dtype=jnp.int32), mode="drop"
    )
    fpad = jnp.concatenate([feat, jnp.zeros((1, feat.shape[-1]), feat.dtype)], 0)
    return fpad[ids[:g]].reshape(ny, nx, feat.shape[-1])


def _make(rng, bsz, v, g, n_valid, c=64):
    feats = rng.randn(bsz, v, c).astype(np.float32)
    lins = np.full((bsz, v), g, np.int64)
    for b in range(bsz):
        lins[b, :n_valid] = np.sort(rng.choice(g, n_valid, replace=False))
        feats[b, n_valid:] = 0.0
    return feats, lins


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_canvas_exact_vs_xla(dtype):
    rng = np.random.RandomState(0)
    ny, nx, v = 64, 48, 256
    g = ny * nx
    feats, lins = _make(rng, 2, v, g, 200)
    feats_j = jnp.asarray(feats, jnp.dtype(dtype))
    lins_j = jnp.asarray(lins, jnp.int32)
    ref = np.asarray(
        jax.vmap(lambda f, l: _ref_canvas(f, l, ny, nx))(feats_j, lins_j),
        np.float32,
    )
    got = np.asarray(
        scatter_canvas(feats_j, lins_j, ny, nx, 256, True), np.float32
    )
    # bit-exact in both dtypes: one-hot rows are exact in bf16, and the
    # fp32 path forces HIGHEST matmul precision
    np.testing.assert_array_equal(got, ref)


def test_canvas_edge_cases():
    rng = np.random.RandomState(1)
    ny, nx, v = 20, 48, 64
    g = ny * nx

    # all-invalid sample -> all-zero canvas
    feats = jnp.asarray(rng.randn(1, v, 64), jnp.float32)
    lins = jnp.full((1, v), g, jnp.int32)
    got = np.asarray(scatter_canvas(feats, lins, ny, nx, 256, True))
    assert got.shape == (1, ny, nx, 64)
    np.testing.assert_array_equal(got, 0.0)

    # every slot valid, ids saturating the grid tail (crosses the
    # non-divisible last tile)
    lins_full = jnp.asarray(
        np.sort(rng.choice(g, v, replace=False))[None], jnp.int32
    )
    ref = np.asarray(_ref_canvas(feats[0], lins_full[0], ny, nx))
    got = np.asarray(scatter_canvas(feats, lins_full, ny, nx, 256, True))[0]
    np.testing.assert_array_equal(got, ref)


def test_canvas_vjp_is_cell_gather():
    rng = np.random.RandomState(2)
    ny, nx, v = 32, 32, 128
    g = ny * nx
    feats_np, lins_np = _make(rng, 2, v, g, 100)
    feats = jnp.asarray(feats_np)
    lins = jnp.asarray(lins_np, jnp.int32)

    def loss(f):
        return jnp.sum(scatter_canvas(f, lins, ny, nx, 256, True) ** 2)

    got = np.asarray(jax.grad(loss)(feats))
    expect = np.where((lins_np < g)[..., None], 2.0 * feats_np, 0.0)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_pointpillar_scatter_pallas_parity():
    """The module's Pallas path must equal its XLA path on voxelizer
    output (ascending keys, invalid tail)."""
    import os

    from de6d_tpu.models.backbones_2d.map_to_bev import PointPillarScatter

    rng = np.random.RandomState(3)
    nx, ny, v, c = 48, 40, 128, 64
    feats = jnp.asarray(rng.randn(2, v, c), jnp.float32)
    coords = np.full((2, v, 3), -1, np.int64)
    for b in range(2):
        lin = np.sort(rng.choice(ny * nx, 90, replace=False))
        coords[b, :90, 0] = 0
        coords[b, :90, 1] = lin // nx
        coords[b, :90, 2] = lin % nx
    coords_j = jnp.asarray(coords, jnp.int32)

    mod = PointPillarScatter(
        model_cfg={"NUM_BEV_FEATURES": c}, grid_size=(nx, ny, 1)
    )
    outs = {}
    for flag in ("0", "1"):
        os.environ["DE6D_PALLAS_CANVAS"] = flag
        os.environ["DE6D_PALLAS_INTERPRET"] = "1"
        try:
            bd = {"pillar_features": feats, "voxel_coords": coords_j}
            out = mod.apply({}, bd, train=False)
            outs[flag] = np.asarray(out["spatial_features"])
        finally:
            del os.environ["DE6D_PALLAS_CANVAS"]
            del os.environ["DE6D_PALLAS_INTERPRET"]
    np.testing.assert_array_equal(outs["0"], outs["1"])
