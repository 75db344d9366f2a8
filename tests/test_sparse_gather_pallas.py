"""Parity: Pallas slab-gather subm conv vs the XLA gather path
(interpret mode on CPU; the TPU run is exercised by sparse_probe /
per-config bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.ops import sparse
from de6d_tpu.ops.pallas.sparse_gather import subm_conv_slab


def _make_case(rng, b=2, v=512, cin=16, cout=32, grid=(8, 32, 32),
               n_active=None):
    nz, ny, nx = grid
    feats = []
    keys = []
    for _ in range(b):
        n = n_active or rng.randint(v // 2, v)
        coords = np.stack(
            [
                rng.randint(0, nz, n),
                rng.randint(0, ny, n),
                rng.randint(0, nx, n),
            ],
            axis=-1,
        )
        k = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
        k = np.unique(k)  # sorted ascending, distinct
        kk = np.full((v,), sparse.INVALID, np.int32)
        kk[: k.shape[0]] = k
        f = np.zeros((v, cin), np.float32)
        f[: k.shape[0]] = rng.randn(k.shape[0], cin)
        feats.append(f)
        keys.append(kk)
    return jnp.asarray(np.stack(feats)), jnp.asarray(np.stack(keys)), grid


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_subm_conv_slab_matches_xla(rng, dtype):
    feats, keys, grid = _make_case(rng)
    b, v, cin = feats.shape
    cout = 32
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))
    valid = keys != sparse.INVALID
    feats = feats.astype(dtype)

    idx, hit = jax.vmap(
        lambda k: sparse.subm_neighbor_table(k, grid)
    )(keys)

    ref = jax.vmap(
        lambda f, ti, th, m: sparse.subm_conv_table(
            f, ti, th, w.astype(dtype), m
        )
    )(feats, idx, hit, valid)

    out, ok = subm_conv_slab(
        feats, idx, hit, w, valid, tile=128, slab=256, interpret=True
    )
    assert bool(jnp.all(ok)), "random case should fit the slab"
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_subm_conv_slab_spread_flag(rng):
    """A site whose neighbors span more rows than the slab must be
    reported via ok=False (caller falls back)."""
    # two dense clusters far apart in key space but adjacent spatially
    # cannot happen (keys encode position) — instead force a tiny slab
    feats, keys, grid = _make_case(rng, b=1, v=512)
    cin = feats.shape[-1]
    w = jnp.asarray(rng.randn(27, cin, 8).astype(np.float32))
    valid = keys != sparse.INVALID
    idx, hit = jax.vmap(
        lambda k: sparse.subm_neighbor_table(k, grid)
    )(keys)
    _, ok = subm_conv_slab(
        feats, idx, hit, w, valid, tile=128, slab=8, interpret=True
    )
    assert not bool(jnp.all(ok))


def test_subm_conv_slab_all_invalid(rng):
    v, cin = 256, 16
    feats = jnp.zeros((1, v, cin))
    keys = jnp.full((1, v), sparse.INVALID, jnp.int32)
    w = jnp.asarray(rng.randn(27, cin, 8).astype(np.float32))
    valid = keys != sparse.INVALID
    idx, hit = jax.vmap(
        lambda k: sparse.subm_neighbor_table(k, (8, 8, 8))
    )(keys)
    out, ok = subm_conv_slab(
        feats, idx, hit, w, valid, tile=128, slab=256, interpret=True
    )
    assert bool(jnp.all(ok))
    assert float(jnp.abs(out).sum()) == 0.0


def test_strided_table_matches_strided_conv(rng):
    """strided_neighbor_table + subm_conv_table ≡ strided_conv, and the
    slab kernel matches both (the SparseDownLayer eval path)."""
    feats, keys, grid = _make_case(rng, b=2, v=256, cin=8, grid=(8, 16, 16))
    b, v, cin = feats.shape
    cout = 16
    kernel, stride, padding = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))

    out_keys = jax.vmap(
        lambda k: sparse.downsample_coords(k, grid, stride, padding, v,
                                           kernel=kernel)[0]
    )(keys)
    _, out_grid = sparse.downsample_coords(
        keys[0], grid, stride, padding, v, kernel=kernel
    )

    ref = jax.vmap(
        lambda f, k, ok: sparse.strided_conv(
            f, k, grid, w, kernel, stride, padding, ok, out_grid
        )
    )(feats, keys, out_keys)

    ti, th = jax.vmap(
        lambda k, ok: sparse.strided_neighbor_table(
            k, ok, grid, out_grid, kernel, stride, padding
        )
    )(keys, out_keys)
    mask = out_keys != sparse.INVALID
    via_table = jax.vmap(
        lambda f, a, h, m: sparse.subm_conv_table(f, a, h, w, m)
    )(feats, ti, th, mask)
    np.testing.assert_allclose(
        np.asarray(via_table), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    out, ok = subm_conv_slab(
        feats, ti, th, w, mask, tile=128, slab=256, interpret=True
    )
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
