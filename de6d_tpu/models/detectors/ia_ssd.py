"""IA-SSD detector.

Parity: reference detectors/ia_ssd.py (:27) with IASSD_Backbone
(backbones_3d/IASSD_backbone.py:192 — ctr-aware sampling encoder) and
IASSD_Head (dense_heads/IASSD_head.py:841).

Round-1 composition: the backbone is the fusion-sampling SA stack with
confidence-MLP scores driving top-k ('c-fps' ≙ the reference's
ctr_aware/cls sampling on semantic logits); the head is the vote head
with PointResidual_BinOri_Coder. Known deviations, to close next
round: per-class (rather than max-class) ctr-aware weighting and the
IoU-aware classification target scaling of IASSD_Head.
"""

from __future__ import annotations

from ...registry import BACKBONES_3D, DETECTORS, POINT_HEADS
from ..backbones_3d.pointnet2_backbone import _PointNet2Base
from ..dense_heads.point_head_vote import _PointHeadVoteBase
from .det6d import _PointVoteDetector


@BACKBONES_3D.register
class IASSD_Backbone(_PointNet2Base):
    """Ctr-aware sampling encoder — same SA machinery; configs select
    ['d-fps', ..., 'c-fps'] per layer."""

    def __call__(self, batch_dict, train: bool = False):
        return self.run_backbone(batch_dict, train)


@POINT_HEADS.register
class IASSD_Head(_PointHeadVoteBase):
    """Contextual-centroid vote head (bin-ori coder)."""


@DETECTORS.register
class IASSD(_PointVoteDetector):
    pass
