"""Data layer: datasets, processors, augmentors, eval protocols.

Parity: reference core/pcdet/datasets. The torch DataLoader machinery
(datasets/__init__.py:50-79) is replaced by a host-side numpy pipeline
feeding fixed-shape batches (see loader.py).
"""

from .dataset import DatasetTemplate
from .loader import build_dataloader
from .kitti import kitti_dataset  # noqa: F401  (registry)
from .slopedkitti import slopedkitti_dataset  # noqa: F401
from .nuscenes import nuscenes_dataset  # noqa: F401
from .waymo import waymo_dataset  # noqa: F401
from .lyft import lyft_dataset  # noqa: F401
from .pandaset import pandaset_dataset  # noqa: F401

__all__ = ["DatasetTemplate", "build_dataloader"]
