"""Model factory (parity: reference models/__init__.py:16-52).

``build_network(model_cfg, num_class, dataset)`` returns a flax module
composed from the registry by cfg NAME strings. There is no
``load_data_to_gpu`` analog — batches are device_put/sharded by the
input pipeline (de6d_tpu.parallel), and the train step is a pure
function of (params, batch_dict).
"""

from __future__ import annotations

from ..registry import DETECTORS
from . import backbones_3d  # noqa: F401  (registers VFEs/backbones)
from . import backbones_2d  # noqa: F401
from . import dense_heads  # noqa: F401
from . import roi_heads  # noqa: F401
from . import detectors  # noqa: F401  (registers detectors)


_MODULE_SLOTS = (
    "VFE", "BACKBONE_3D", "MAP_TO_BEV", "PFE", "BACKBONE_2D",
    "DENSE_HEAD", "POINT_HEAD", "ROI_HEAD",
)



# batch keys that ship to the device (everything else stays host-side:
# frame_id, calib objects, image_shape lists). load_data_to_gpu analog
# (reference models/__init__.py:22-42).
DEVICE_BATCH_KEYS = (
    "points", "points_mask", "gt_boxes", "point_voxel_idx",
    # CaDDN camera stack
    "images", "depth_maps", "trans_lidar_to_cam", "trans_cam_to_img",
    "gt_boxes2d", "image_shape",
)


def device_batch(batch):
    """Subset of a collated batch that is device-shippable."""
    return {k: batch[k] for k in DEVICE_BATCH_KEYS if k in batch}


def build_network(model_cfg, num_class, dataset):
    # thread the model-level compute dtype into every module slot while
    # the cfg is still a mutable dict (flax freezes module attributes —
    # see model_utils/dtype_utils.py)
    dtype_name = str(model_cfg.get("COMPUTE_DTYPE", "float32"))
    if dtype_name != "float32":
        for slot in _MODULE_SLOTS:
            if slot in model_cfg:
                model_cfg[slot]["_COMPUTE_DTYPE"] = dtype_name
    cls = DETECTORS.get(model_cfg["NAME"])
    return cls(
        model_cfg=model_cfg,
        num_class=num_class,
        dataset=dataset,
    )
