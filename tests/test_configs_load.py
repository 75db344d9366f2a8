"""Every shipped yaml config must load and build its network."""

import glob

import pytest

from de6d_tpu.config import Config, cfg_from_yaml_file
from de6d_tpu.models import build_network
from de6d_tpu.models.detectors.detector3d_template import DatasetSpec

CONFIGS = sorted(
    glob.glob("configs/kitti_models/*.yaml")
    + glob.glob("configs/slopedkitti_models/*.yaml")
)


@pytest.mark.parametrize("cfg_file", CONFIGS)
def test_config_builds_network(cfg_file):
    cfg = cfg_from_yaml_file(cfg_file, Config())
    assert "MODEL" in cfg and "DATA_CONFIG" in cfg
    dp = cfg.DATA_CONFIG
    vox = next(
        (p for p in dp.DATA_PROCESSOR
         if p["NAME"] == "transform_points_to_voxels"), None,
    )
    spec = DatasetSpec(
        class_names=tuple(cfg.CLASS_NAMES),
        point_feature_dim=len(
            dp.POINT_FEATURE_ENCODING["used_feature_list"]
        ),
        point_cloud_range=tuple(dp.POINT_CLOUD_RANGE),
        voxel_size=tuple(vox["VOXEL_SIZE"]) if vox else (0.16, 0.16, 4.0),
    )
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), spec)
    assert model is not None
    # optimizer config must build too
    from de6d_tpu.train.optimization import build_optimizer_and_schedule
    import jax.numpy as jnp

    opt, sched = build_optimizer_and_schedule(
        cfg.OPTIMIZATION, {"w": jnp.ones((2, 2))}, steps_per_epoch=10
    )
    assert float(sched(0)) > 0
