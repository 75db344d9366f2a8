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


def build_network(model_cfg, num_class, dataset):
    cls = DETECTORS.get(model_cfg.NAME)
    return cls(
        model_cfg=model_cfg,
        num_class=num_class,
        dataset=dataset,
    )
