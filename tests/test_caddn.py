"""CaDDN camera path: grid-sample oracle vs torch, frustum math, and
tiny end-to-end forward + training loss under jit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def test_grid_sample_3d_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    from de6d_tpu.ops.grid_sample import grid_sample_3d

    d, h, w, c = 5, 7, 6, 4
    vol = rng.randn(d, h, w, c).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (3, 8, 9, 3)).astype(np.float32)

    got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid)))

    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # (1,C,D,H,W)
    t_grid = torch.from_numpy(grid)[None]  # (1, 3, 8, 9, 3)
    ref = F.grid_sample(
        t_vol, t_grid, mode="bilinear", padding_mode="zeros",
        align_corners=True,
    )[0].permute(1, 2, 3, 0).numpy()  # (3, 8, 9, C)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    from de6d_tpu.ops.grid_sample import grid_sample_2d

    h, w, c = 9, 8, 3
    img = rng.randn(h, w, c).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (5, 6, 2)).astype(np.float32)
    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode="zeros", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bin_depths_modes():
    from de6d_tpu.utils import transform_utils as tu

    depth = jnp.asarray([[2.0, 10.0, 46.0, 100.0, np.nan]])
    for mode in ("UD", "LID", "SID"):
        t = tu.bin_depths(depth, mode, 2.0, 46.8, 80, target=True)
        t = np.asarray(t)
        assert t.dtype == np.int32
        assert t[0, -1] == 80  # nan → overflow bin
        assert t[0, 3] == 80  # beyond depth_max → overflow bin
        assert 0 <= t[0, 1] < 80


def test_fg_mask(rng):
    from de6d_tpu.models.backbones_3d.vfe.image_vfe_modules.ffn import (
        compute_fg_mask,
    )

    boxes = jnp.asarray(
        [[[4.0, 8.0, 12.0, 16.0], [0.0, 0.0, 0.0, 0.0]]]
    )  # one real box, one zero-area pad
    m = np.asarray(compute_fg_mask(boxes, (1, 20, 20), 4))
    # downsampled by 4 → box [1, 2, 3, 4]
    assert m[0, 2, 1] and m[0, 3, 2]
    assert not m[0, 0, 0]
    assert m.sum() == 2 * 2


def _caddn_cfg():
    return {
        "NAME": "CaDDN",
        "VFE": {
            "NAME": "ImageVFE",
            "FFN": {
                "NAME": "DepthFFN",
                "DDN": {
                    "NAME": "DDNDeepLabV3",
                    "BACKBONE_NAME": "ResNet50",
                    "ARGS": {"feat_extract_layer": "layer1"},
                },
                "CHANNEL_REDUCE": {
                    "in_channels": 256, "out_channels": 16,
                    "kernel_size": 1,
                },
                "DISCRETIZE": {
                    "mode": "LID", "num_bins": 12,
                    "depth_min": 2.0, "depth_max": 46.8,
                },
                "LOSS": {
                    "NAME": "DDNLoss",
                    "ARGS": {
                        "weight": 3.0, "alpha": 0.25, "gamma": 2.0,
                        "fg_weight": 13, "bg_weight": 1,
                    },
                },
            },
            "F2V": {
                "NAME": "FrustumToVoxel",
                "SAMPLER": {"mode": "bilinear", "padding_mode": "zeros"},
            },
        },
        "MAP_TO_BEV": {
            "NAME": "Conv2DCollapse",
            "NUM_BEV_FEATURES": 16,
            "ARGS": {"kernel_size": 1},
        },
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1],
            "LAYER_STRIDES": [2],
            "NUM_FILTERS": [16],
            "UPSAMPLE_STRIDES": [1],
            "NUM_UPSAMPLE_FILTERS": [16],
        },
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle",
            "CLASS_AGNOSTIC": False,
            "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539,
            "DIR_LIMIT_OFFSET": 0.0,
            "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [
                {
                    "class_name": "Car",
                    "anchor_sizes": [[3.9, 1.6, 1.56]],
                    "anchor_rotations": [0, 1.57],
                    "anchor_bottom_heights": [-1.78],
                    "align_center": False,
                    "feature_map_stride": 2,
                    "matched_threshold": 0.6,
                    "unmatched_threshold": 0.45,
                }
            ],
            "TARGET_ASSIGNER_CONFIG": {
                "NAME": "AxisAlignedTargetAssigner",
                "POS_FRACTION": -1.0,
                "SAMPLE_SIZE": 512,
                "NORM_BY_NUM_EXAMPLES": False,
                "MATCH_HEIGHT": False,
                "BOX_CODER": "ResidualCoder",
            },
            "LOSS_CONFIG": {
                "LOSS_WEIGHTS": {
                    "cls_weight": 1.0, "loc_weight": 2.0,
                    "dir_weight": 0.2,
                    "code_weights": [1.0] * 7,
                }
            },
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
            "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {
                "MULTI_CLASSES_NMS": False,
                "NMS_TYPE": "nms_gpu",
                "NMS_THRESH": 0.01,
                "NMS_PRE_MAXSIZE": 64,
                "NMS_POST_MAXSIZE": 16,
            },
        },
    }


def _caddn_batch(rng, b=1, img_hw=(32, 40)):
    h, w = img_hw
    images = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    # lidar → camera: x_cam = -y_l, y_cam = -z_l, z_cam = x_l
    l2c = np.zeros((4, 4), np.float32)
    l2c[0, 1] = -1
    l2c[1, 2] = -1
    l2c[2, 0] = 1
    l2c[3, 3] = 1
    f = 35.0
    c2i = np.array(
        [[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0]], np.float32
    )
    gt = np.zeros((b, 2, 8), np.float32)
    gt[:, 0] = [10.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [16.0, 2.0, -1.0, 3.9, 1.6, 1.56, -0.5, 1]
    return {
        "images": jnp.asarray(images),
        "trans_lidar_to_cam": jnp.asarray(np.tile(l2c, (b, 1, 1))),
        "trans_cam_to_img": jnp.asarray(np.tile(c2i, (b, 1, 1))),
        "image_shape": jnp.asarray(
            np.tile(np.array([h, w], np.int32), (b, 1))
        ),
        "depth_maps": jnp.asarray(
            rng.uniform(2, 40, (b, h // 4, w // 4)).astype(np.float32)
        ),
        "gt_boxes2d": jnp.asarray(
            np.array([[[8, 8, 24, 20], [0, 0, 0, 0]]], np.float32)
        ),
        "gt_boxes": jnp.asarray(gt),
    }


def test_caddn_forward_and_loss(rng):
    from de6d_tpu.models import build_network
    from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

    spec = DatasetSpec(
        class_names=("Car",),
        point_feature_dim=4,
        point_cloud_range=(2.0, -8.0, -3.0, 18.0, 8.0, 1.0),
        voxel_size=(1.0, 1.0, 1.0),  # grid 16 x 16 x 4
        depth_downsample_factor=4,
    )
    model = build_network(_caddn_cfg(), num_class=1, dataset=spec)
    batch = _caddn_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)

    out = model.apply(variables, dict(batch), train=False)
    assert out["voxel_features"].shape == (1, 4, 16, 16, 16)
    assert out["batch_cls_preds"].shape[0] == 1
    assert np.isfinite(np.asarray(out["batch_cls_preds"])).all()
    assert np.isfinite(np.asarray(out["batch_box_preds"])).all()

    # training loss under jit
    @jax.jit
    def loss_fn(params, batch):
        out, mut = model.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            dict(batch), train=True, mutable=["batch_stats"],
        )
        loss, tb = model.get_training_loss(out)
        return loss

    loss = loss_fn(variables["params"], batch)
    assert np.isfinite(float(loss))

    # depth loss responds to depth targets
    from de6d_tpu.models.backbones_3d.vfe.image_vfe import image_vfe_loss

    out_t = model.apply(
        variables, dict(batch), train=True, mutable=["batch_stats"]
    )[0]
    ddn, tb = image_vfe_loss(out_t, _caddn_cfg()["VFE"], 4)
    assert np.isfinite(float(ddn)) and float(ddn) > 0
