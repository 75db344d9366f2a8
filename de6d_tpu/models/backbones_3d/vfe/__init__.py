from .mean_vfe import MeanVFE, DynamicMeanVFE
from .pillar_vfe import PillarVFE, DynamicPillarVFE
from .image_vfe import ImageVFE

__all__ = [
    "MeanVFE", "DynamicMeanVFE", "PillarVFE", "DynamicPillarVFE",
    "ImageVFE",
]
