"""Sparse conv ops vs dense conv oracle + SECOND backbone e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from de6d_tpu.ops import sparse


def make_sparse(rng, grid, n_active, c):
    nz, ny, nx = grid
    total = nz * ny * nx
    lin = rng.choice(total, n_active, replace=False)
    coords = np.stack(
        [lin // (ny * nx), (lin // nx) % ny, lin % nx], axis=-1
    ).astype(np.int32)
    feats = rng.randn(n_active, c).astype(np.float32)
    return coords, feats


def dense_from_sparse(coords, feats, grid):
    nz, ny, nx = grid
    dense = np.zeros((nz, ny, nx, feats.shape[-1]), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return dense


def test_subm_conv_matches_dense_conv(rng):
    grid = (8, 10, 12)
    cin, cout = 4, 6
    coords, feats = make_sparse(rng, grid, 60, cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    # pad to capacity
    v = 80
    keys = np.asarray(
        sparse.coords_to_keys(jnp.asarray(coords), grid)
    )
    keys_pad = np.full(v, sparse.INVALID, np.int64)
    feats_pad = np.zeros((v, cin), np.float32)
    keys_pad[:60] = keys
    feats_pad[:60] = feats
    f_sorted, k_sorted = sparse.sort_sparse(
        jnp.asarray(feats_pad), jnp.asarray(keys_pad.astype(np.int32))
    )
    out = np.asarray(
        sparse.subm_conv(f_sorted, k_sorted, grid, jnp.asarray(w))
    )

    # dense conv oracle, evaluated at active sites only (submanifold)
    dense = dense_from_sparse(coords, feats, grid)
    padded = np.pad(dense, ((1, 1), (1, 1), (1, 1), (0, 0)))
    k_sorted_np = np.asarray(k_sorted)
    for s in range(60):
        key = int(k_sorted_np[s])
        z, y, x = (
            key // (grid[1] * grid[2]),
            (key // grid[2]) % grid[1],
            key % grid[2],
        )
        patch = padded[z : z + 3, y : y + 3, x : x + 3].reshape(27, cin)
        expect = np.einsum("kc,kcd->d", patch, w)
        # bf16 GEMM tolerance (the conv matmuls deliberately run at
        # default (bf16) precision for MXU throughput)
        np.testing.assert_allclose(out[s], expect, atol=2e-2, rtol=2e-2)


def test_strided_conv_downsample(rng):
    grid = (8, 8, 8)
    cin, cout = 3, 5
    coords, feats = make_sparse(rng, grid, 40, cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    v = 64
    keys_pad = np.full(v, np.iinfo(np.int32).max, np.int32)
    feats_pad = np.zeros((v, cin), np.float32)
    keys_pad[:40] = np.asarray(sparse.coords_to_keys(jnp.asarray(coords), grid))
    feats_pad[:40] = feats
    f_s, k_s = sparse.sort_sparse(jnp.asarray(feats_pad), jnp.asarray(keys_pad))

    out_keys, out_grid = sparse.downsample_coords(
        k_s, grid, (2, 2, 2), (1, 1, 1), 64
    )
    assert out_grid == (4, 4, 4) or out_grid == (5, 5, 5)
    out = np.asarray(
        sparse.strided_conv(
            f_s, k_s, grid, jnp.asarray(w), (3, 3, 3), (2, 2, 2),
            (1, 1, 1), out_keys, out_grid,
        )
    )
    # oracle: dense strided conv at the discovered output sites
    dense = dense_from_sparse(coords, feats, grid)
    padded = np.pad(dense, ((1, 1), (1, 1), (1, 1), (0, 0)))
    ok = np.asarray(out_keys)
    nzo, nyo, nxo = out_grid
    n_valid = int((ok != sparse.INVALID).sum())
    assert n_valid > 0
    for s in range(n_valid):
        key = int(ok[s])
        z, y, x = key // (nyo * nxo), (key // nxo) % nyo, key % nxo
        # input window starts at (2z-1)+1, ... in padded coords
        patch = padded[2 * z : 2 * z + 3, 2 * y : 2 * y + 3,
                       2 * x : 2 * x + 3]
        if patch.shape[:3] != (3, 3, 3):
            pz, py, px = patch.shape[:3]
            patch = np.pad(
                patch, ((0, 3 - pz), (0, 3 - py), (0, 3 - px), (0, 0))
            )
        expect = np.einsum("kc,kcd->d", patch.reshape(27, cin), w)
        np.testing.assert_allclose(out[s], expect, atol=2e-2, rtol=2e-2)


def test_second_backbone_e2e(rng):
    """MeanVFE → VoxelBackBone8x → HeightCompression → BEV → head."""
    from de6d_tpu.config import Config
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    import model_fixtures

    model_cfg, spec0 = model_fixtures.tiny_pointpillar_cfg(num_class=1)
    cfg = Config(model_cfg.to_dict())
    cfg["NAME"] = "SECONDNet"
    cfg["VFE"] = {"NAME": "MeanVFE"}
    cfg["BACKBONE_3D"] = {
        "NAME": "VoxelBackBone8x",
        "NUM_FILTERS": [8, 8, 16, 16, 16],
        "OUT_CHANNELS": 16,
    }
    cfg["MAP_TO_BEV"] = {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32}
    # SECOND-style BEV backbone: output stride must equal the anchor
    # feature_map_stride (8) given the 8x-downsampled sparse volume
    cfg["BACKBONE_2D"] = {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [1, 1],
        "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [32, 64],
        "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [32, 32],
    }
    cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"] = [
        dict(cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"][0])
    ]
    cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"][0]["feature_map_stride"] = 8
    spec = DatasetSpec(
        class_names=("Car",),
        point_feature_dim=4,
        point_cloud_range=(0.0, -6.4, -3.0, 12.8, 6.4, 1.0),
        voxel_size=(0.1, 0.1, 0.1),
        max_voxels=2000,
        max_points_per_voxel=5,
    )
    model = build_network(cfg, num_class=1, dataset=spec)
    batch = model_fixtures.random_batch(rng, spec, batch_size=2,
                                        n_points=1024, n_gt=3)
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )
    loss, tb = model.get_training_loss(out)
    assert np.isfinite(float(loss))
    ev = model.apply(variables, dict(batch), train=False)
    assert ev["batch_box_preds"].shape[-1] == 7
    # grads flow through the sparse conv weights
    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            dict(batch), train=True, mutable=["batch_stats"],
        )
        return model.get_training_loss(o)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def test_neighbor_table_matches_subm_conv(rng):
    """Table path (x-adjacency, 9 searches) bit-equals the 27-search
    subm_conv, including x borders, invalid tails, and a fully-dense
    (no INVALID tail) capacity — the insertion-point clipping edge."""
    grid = (5, 7, 9)
    cin, cout = 4, 6
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    for n_active, v in ((60, 80), (80, 80), (3, 16)):
        coords, feats = make_sparse(rng, grid, n_active, cin)
        keys = np.asarray(sparse.coords_to_keys(jnp.asarray(coords), grid))
        keys_pad = np.full(v, sparse.INVALID, np.int64)
        feats_pad = np.zeros((v, cin), np.float32)
        keys_pad[:n_active] = keys
        feats_pad[:n_active] = feats
        f_s, k_s = sparse.sort_sparse(
            jnp.asarray(feats_pad), jnp.asarray(keys_pad.astype(np.int32))
        )
        ref = sparse.subm_conv(f_s, k_s, grid, w)
        ti, th = sparse.subm_neighbor_table(k_s, grid)
        out = sparse.subm_conv_table(
            f_s, ti, th, w, k_s != sparse.INVALID
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_unique_keys_matches_jnp_unique(rng):
    for n, size in ((128, 64), (128, 200), (7, 7)):
        keys = rng.choice(300, n).astype(np.int32)
        keys[rng.rand(n) < 0.3] = sparse.INVALID
        ref = np.asarray(
            jnp.unique(jnp.asarray(keys), size=size,
                       fill_value=sparse.INVALID)
        )
        out = np.asarray(sparse.unique_keys(jnp.asarray(keys), size))
        np.testing.assert_array_equal(ref, out)
