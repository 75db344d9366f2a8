from .detector3d_template import Detector3DTemplate, DatasetSpec
from .pointpillar import PointPillar

__all__ = ["Detector3DTemplate", "DatasetSpec", "PointPillar"]
