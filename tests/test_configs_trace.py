"""Every shipped yaml config must TRACE end-to-end at its real shapes.

test_configs_load.py only builds the flax module tree; it cannot catch
config<->model shape mismatches that appear at trace time (e.g. r4's
SECOND crash: the inherited pillar POINT_CLOUD_RANGE gives a 173x199
/8 grid, and BaseBEVBackbone's stride-2 up/down paths disagree by one
pixel on odd dims). jax.eval_shape runs the full abstract forward with
zero compute, so the whole zoo traces in minutes on CPU.

Data comes from the real loader (data/kitti, data/slopedkitti — 200
synthetic frames committed in-tree) so the point/voxel shapes are the
exact shapes training would see.
"""

import copy
import glob

import pytest

import jax

from de6d_tpu.config import cfg_from_yaml_file, cfg as CFG
from de6d_tpu.datasets import build_dataloader
from de6d_tpu.models import build_network

CONFIGS = sorted(
    glob.glob("configs/kitti_models/*.yaml")
    + glob.glob("configs/slopedkitti_models/*.yaml")
)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("cfg_file", CONFIGS)
def test_config_traces_at_real_shapes(cfg_file):
    cfg = cfg_from_yaml_file(cfg_file, copy.deepcopy(CFG))
    ds, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, 2,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"),
        training=True, workers=0,
    )
    batch = next(iter(loader))
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=ds
    )
    b = {
        k: batch[k]
        for k in ("points", "points_mask", "gt_boxes", "images",
                  "depth_maps", "trans_lidar_to_cam", "trans_cam_to_img",
                  "gt_boxes2d", "image_shape")
        if k in batch
    }
    # abstract trace only — catches every static shape error at zero
    # compute cost; train=True exercises target assignment + losses
    jax.eval_shape(
        lambda bb: model.init(jax.random.PRNGKey(0), bb, train=True), b
    )
