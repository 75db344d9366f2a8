from .pointrcnn_head import PointRCNNHead
from .pvrcnn_head import PVRCNNHead
from .second_head import SECONDHead
from .parta2_head import PartA2FCHead
from .voxelrcnn_head import VoxelRCNNHead

__all__ = ["PointRCNNHead", "PVRCNNHead", "SECONDHead", "PartA2FCHead", "VoxelRCNNHead"]
