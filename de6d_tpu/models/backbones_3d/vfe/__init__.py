from .mean_vfe import MeanVFE, DynamicMeanVFE
from .pillar_vfe import PillarVFE, DynamicPillarVFE

__all__ = ["MeanVFE", "DynamicMeanVFE", "PillarVFE", "DynamicPillarVFE"]
