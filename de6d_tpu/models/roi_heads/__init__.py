from .pointrcnn_head import PointRCNNHead
from .pvrcnn_head import PVRCNNHead

__all__ = ["PointRCNNHead", "PVRCNNHead"]
