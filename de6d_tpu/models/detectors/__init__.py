from .detector3d_template import Detector3DTemplate, DatasetSpec
from .pointpillar import PointPillar
from .det6d import Det6D, SSD3D
from .second_net import SECONDNet
from .point_rcnn import PointRCNN
from .pv_rcnn import PVRCNN
from .pv_rcnn_plusplus import PVRCNNPlusPlus
from .center_point import CenterPoint
from .second_net_iou import SECONDNetIoU
from .parta2_net import PartA2Net
from .voxel_rcnn import VoxelRCNN
from .ia_ssd import IASSD
from .caddn import CaDDN

__all__ = ["Detector3DTemplate", "DatasetSpec", "PointPillar", "Det6D", "SSD3D", "SECONDNet", "PointRCNN", "PVRCNN", "PVRCNNPlusPlus", "CenterPoint", "SECONDNetIoU", "PartA2Net", "VoxelRCNN", "IASSD", "CaDDN"]
