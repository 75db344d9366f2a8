"""Data layer: datasets, processors, augmentors, eval protocols.

Parity: reference core/pcdet/datasets. The torch DataLoader machinery
(datasets/__init__.py:50-79) is replaced by a host-side numpy pipeline
feeding fixed-shape batches (see loader.py).
"""

from .dataset import DatasetTemplate
from .loader import build_dataloader

__all__ = ["DatasetTemplate", "build_dataloader"]
