"""PV-RCNN++ (reference detectors/pv_rcnn_plusplus.py:53).

Same spine as PV-RCNN with sectorized-FPS keypoint sampling
(SAMPLE_METHOD: SPC in the PFE config) and the VectorPool-style
aggregation expressed through the shared SA machinery.
"""

from __future__ import annotations

from ...registry import DETECTORS
from .pv_rcnn import PVRCNN


@DETECTORS.register
class PVRCNNPlusPlus(PVRCNN):
    pass
