"""Fused (sorted-point) PillarVFE path vs the padded-buffer path.

The fused path never materializes the (V, P, C) voxel buffer — it runs
the PFN on the sorted point stream and reduces per pillar with
segmented scans (TPU scatters serialize; this path is gather/scan
only). In eval it must match the buffer path bit-for-bit-ish (same
masked point sets, same params; only matmul tiling may differ).

Also covers the sorted-segment reduction helpers and the
binary-search (gather) BEV canvas against the scatter canvas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from de6d_tpu.ops import voxelize as vox


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_sorted_segment_helpers(rng):
    n, v_cap, p_cap = 64, 10, 4
    ids_np = np.sort(rng.randint(0, 8, n)).astype(np.int32)
    vals_np = rng.randn(n, 3).astype(np.float32)
    # starts/counts from the sorted ids
    starts = np.full(v_cap, n, np.int32)
    counts = np.zeros(v_cap, np.int32)
    uniq, first, cnt = np.unique(ids_np, return_index=True,
                                 return_counts=True)
    # dense slots in sorted order
    for s, (f, c) in enumerate(zip(first, cnt)):
        starts[s] = f
        counts[s] = min(c, p_cap)
    dense_ids = np.searchsorted(uniq, ids_np).astype(np.int32)

    got_sum = np.asarray(vox.sorted_segment_sum(
        jnp.asarray(vals_np), jnp.asarray(dense_ids),
        jnp.asarray(starts), jnp.asarray(counts)))
    got_max = np.asarray(vox.sorted_segment_max(
        jnp.asarray(vals_np), jnp.asarray(dense_ids),
        jnp.asarray(starts), jnp.asarray(counts)))
    for s in range(v_cap):
        if counts[s] == 0:
            np.testing.assert_allclose(got_sum[s], 0.0)
            np.testing.assert_allclose(got_max[s], 0.0)
        else:
            w = vals_np[starts[s]: starts[s] + counts[s]]
            np.testing.assert_allclose(got_sum[s], w.sum(0), rtol=1e-6,
                                       atol=1e-6)
            np.testing.assert_allclose(got_max[s], w.max(0), rtol=1e-6)


def _tiny_spec_and_batch(rng, n=512, max_voxels=600):
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    pc = (0.0, -4.0, -3.0, 8.0, 4.0, 1.0)
    spec = DatasetSpec(
        class_names=("Car",), point_feature_dim=4, point_cloud_range=pc,
        voxel_size=(0.2, 0.2, 4.0), max_voxels=max_voxels,
        max_points_per_voxel=5,
    )
    b = 2
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (b, n))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (b, n))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    # crowd one pillar past the per-voxel cap
    pts[0, :40, 0] = 1.1
    pts[0, :40, 1] = 0.3
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
    }
    return spec, batch


def test_fused_pillar_vfe_matches_buffer_path(rng):
    from de6d_tpu.models.backbones_3d.vfe.pillar_vfe import PillarVFE

    spec, batch = _tiny_spec_and_batch(rng)
    model_cfg = {"NUM_FILTERS": [16], "USE_NORM": True,
                 "USE_ABSLOTE_XYZ": True, "WITH_DISTANCE": True}
    vfe = PillarVFE(
        model_cfg=model_cfg, num_point_features=4,
        voxel_size=spec.voxel_size,
        point_cloud_range=spec.point_cloud_range,
    )

    def vox_one(p, m):
        return vox.voxelize(
            p, m, list(spec.point_cloud_range), list(spec.voxel_size),
            spec.max_voxels, spec.max_points_per_voxel,
        )

    out = jax.vmap(vox_one)(batch["points"], batch["points_mask"])
    buf_batch = dict(batch)
    buf_batch.update(
        voxels=out["voxels"], voxel_coords=out["voxel_coords"],
        voxel_num_points=out["voxel_num_points"],
    )
    fused_batch = dict(buf_batch)
    fused_batch.update(
        order=out["order"], sorted_slot=out["sorted_slot"],
        voxel_starts=out["voxel_starts"],
    )

    variables = vfe.init(jax.random.PRNGKey(0), dict(buf_batch), train=False)
    a = vfe.apply(variables, dict(buf_batch), train=False)["pillar_features"]
    b = vfe.apply(variables, dict(fused_batch), train=False)[
        "pillar_features"
    ]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_fused_pillar_vfe_multilayer(rng):
    """Two-stage PFN exercises the segment-max broadcast concat."""
    from de6d_tpu.models.backbones_3d.vfe.pillar_vfe import PillarVFE

    spec, batch = _tiny_spec_and_batch(rng, n=256, max_voxels=300)
    model_cfg = {"NUM_FILTERS": [8, 16], "USE_NORM": True}
    vfe = PillarVFE(
        model_cfg=model_cfg, num_point_features=4,
        voxel_size=spec.voxel_size,
        point_cloud_range=spec.point_cloud_range,
    )

    def vox_one(p, m):
        return vox.voxelize(
            p, m, list(spec.point_cloud_range), list(spec.voxel_size),
            spec.max_voxels, spec.max_points_per_voxel,
        )

    out = jax.vmap(vox_one)(batch["points"], batch["points_mask"])
    buf_batch = dict(batch)
    buf_batch.update(
        voxels=out["voxels"], voxel_coords=out["voxel_coords"],
        voxel_num_points=out["voxel_num_points"],
    )
    fused_batch = dict(buf_batch)
    fused_batch.update(
        order=out["order"], sorted_slot=out["sorted_slot"],
        voxel_starts=out["voxel_starts"],
    )
    variables = vfe.init(jax.random.PRNGKey(1), dict(buf_batch), train=False)
    a = vfe.apply(variables, dict(buf_batch), train=False)["pillar_features"]
    b = vfe.apply(variables, dict(fused_batch), train=False)[
        "pillar_features"
    ]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_gather_canvas_matches_scatter_canvas(rng):
    from de6d_tpu.models.backbones_2d.map_to_bev import PointPillarScatter

    nx, ny, v = 16, 12, 40
    # ascending unique linear keys with an invalid tail (as the device
    # voxelizer emits)
    lin = np.sort(rng.choice(nx * ny, size=30, replace=False))
    coords = np.full((1, v, 3), -1, np.int32)
    coords[0, :30, 0] = 0
    coords[0, :30, 1] = lin // nx
    coords[0, :30, 2] = lin % nx
    feats = rng.randn(1, v, 6).astype(np.float32)

    mod = PointPillarScatter(
        model_cfg={"NUM_BEV_FEATURES": 6}, grid_size=(nx, ny, 1)
    )
    base = {"pillar_features": jnp.asarray(feats),
            "voxel_coords": jnp.asarray(coords)}
    va = mod.init(jax.random.PRNGKey(0), dict(base), train=False)
    a = mod.apply(va, dict(base), train=False)["spatial_features"]
    sorted_in = dict(base)
    sorted_in["voxel_coords_sorted"] = True
    b = mod.apply(va, sorted_in, train=False)["spatial_features"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
