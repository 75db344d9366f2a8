"""VectorPool aggregation (PV-RCNN++): grid/interpolation math vs a
numpy transcription of the reference semantics, plus an e2e forward of
the shipped pv_rcnn_plusplus config at tiny scale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(21)


def test_grid_offsets_match_reference():
    from de6d_tpu.models.backbones_3d.vectorpool import _grid_offsets

    # reference get_dense_voxels_by_center (:340-366): arange from
    # -R + R/n to R - R/n step 2R/n
    off = _grid_offsets((3, 3, 3), 1.2)
    assert off.shape == (27, 3)
    xs = np.unique(off[:, 0])
    np.testing.assert_allclose(xs, [-0.8, 0.0, 0.8], atol=1e-6)
    off2 = _grid_offsets((2, 2, 2), 1.0)
    np.testing.assert_allclose(np.unique(off2[:, 0]), [-0.5, 0.5],
                               atol=1e-6)


def test_vectorpool_interpolation_oracle(rng):
    """Single group, one center: the module's pre-MLP per-voxel features
    must equal the numpy inverse-distance 3-NN interpolation."""
    from de6d_tpu.models.backbones_3d.vectorpool import (
        VectorPoolAggregation, _grid_offsets,
    )

    n, red = 24, 4
    xyz = rng.uniform(-1.0, 1.0, (1, n, 3)).astype(np.float32)
    feats = rng.randn(1, n, red).astype(np.float32)
    center = np.zeros((1, 1, 3), np.float32)

    mod = VectorPoolAggregation(
        num_local_voxel=(2, 2, 2), max_neighbor_distance=1.0,
        neighbor_nsample=24, num_reduced_channels=red,
        num_channels_of_local_aggregation=8, post_mlps=(8,),
    )
    valid = jnp.ones((1, n), bool)
    cvalid = jnp.ones((1, 1), bool)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(feats),
        valid, jnp.asarray(center), cvalid,
    )
    # capture the interpolated per-voxel features by monkey-free route:
    # recompute the oracle and compare against the module's einsum input
    # via a modified apply that returns intermediates is overkill — here
    # we verify the full output responds EXACTLY like the oracle-driven
    # linear layer: rebuild y manually with the module's params.
    w = np.asarray(variables["params"]["local_agg_kernel"])  # (8,13,8)

    offsets = _grid_offsets((2, 2, 2), 1.0)
    grid = center[0, 0] + offsets  # (8, 3)
    per_voxel = []
    for v in range(8):
        # neighbors within radius*2 of the CENTER
        d_ctr = np.linalg.norm(xyz[0] - center[0, 0], axis=-1)
        nbr = np.where(d_ctr < 2.0)[0][:24]
        d = np.linalg.norm(xyz[0][nbr] - grid[v], axis=-1)
        nn3 = nbr[np.argsort(d)[:3]]
        dist = np.linalg.norm(xyz[0][nn3] - grid[v], axis=-1)
        wgt = 1.0 / (dist + 1e-8)
        wgt = wgt / wgt.sum()
        interp = (feats[0][nn3] * wgt[:, None]).sum(0)
        local = (grid[v] - xyz[0][nn3]).reshape(-1)
        per_voxel.append(np.concatenate([interp, local]))
    per_voxel = np.stack(per_voxel)  # (8, 13)
    want = np.einsum("vc,vcd->vd", per_voxel, w).reshape(-1)

    # module path up to the grouped linear: replicate by calling with
    # identity-friendly BN (init stats) and reading pre-relu via the
    # linearity of BN at init (scale=1, bias=0, mean=0, var=1)
    out = mod.apply(
        variables, jnp.asarray(xyz), jnp.asarray(feats), valid,
        jnp.asarray(center), cvalid, False,
    )
    # at init, BN is identity and the post-MLP is a dense layer; verify
    # by reapplying the module's post-MLP params to relu(want)
    post_w = np.asarray(
        variables["params"]["SharedMLP_0"]["Dense_0"]["kernel"]
    )
    y = np.maximum(want, 0.0) @ post_w
    y = np.maximum(y, 0.0)  # post-MLP BN identity + relu
    # init BatchNorms scale by 1/sqrt(1+eps) each (~0.9995)
    np.testing.assert_allclose(np.asarray(out)[0, 0], y, rtol=3e-3,
                               atol=2e-4)


def test_pv_rcnn_plusplus_e2e(rng):
    from de6d_tpu.config import cfg_from_yaml_file, Config
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    cfg = cfg_from_yaml_file(
        "configs/kitti_models/pv_rcnn_plusplus.yaml", Config()
    )
    # shrink for CPU
    pfe = cfg.MODEL["PFE"]
    pfe["NUM_KEYPOINTS"] = 64
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES), point_feature_dim=4,
        point_cloud_range=(0.0, -6.4, -3.0, 12.8, 6.4, 1.0),
        voxel_size=(0.1, 0.1, 0.1), max_voxels=1500,
        max_points_per_voxel=5,
    )
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), spec)

    b, n = 1, 1024
    pc = spec.point_cloud_range
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(pc[0], pc[3], (b, n))
    pts[..., 1] = rng.uniform(pc[1], pc[4], (b, n))
    pts[..., 2] = rng.uniform(pc[2], pc[5], (b, n))
    gt = np.zeros((b, 2, 8), np.float32)
    gt[0, 0] = [10, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)},
        dict(batch), train=True,
    )
    out = model.apply(
        variables, dict(batch), train=False,
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
    out_t, _ = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"],
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    loss, tb = model.get_training_loss(out_t)
    assert np.isfinite(float(loss))
