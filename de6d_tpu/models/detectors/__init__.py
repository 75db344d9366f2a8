from .detector3d_template import Detector3DTemplate, DatasetSpec
from .pointpillar import PointPillar
from .det6d import Det6D, SSD3D
from .second_net import SECONDNet
from .point_rcnn import PointRCNN
from .pv_rcnn import PVRCNN

__all__ = ["Detector3DTemplate", "DatasetSpec", "PointPillar", "Det6D", "SSD3D", "SECONDNet", "PointRCNN", "PVRCNN"]
