from .anchor_head import AnchorHeadSingle
from .anchor_head_multi import AnchorHeadMulti
from .point_head_vote import PointHeadBoxVote, PointHeadBox6DVote
from .point_head_box import PointHeadBox, PointHeadSimple
from .point_head_box6d import PointHeadBox6D
from .center_head import CenterHead
from .point_intra_part_head import PointIntraPartOffsetHead

__all__ = [
    "AnchorHeadSingle", "AnchorHeadMulti", "PointHeadBoxVote",
    "PointHeadBox6DVote", "PointHeadBox", "PointHeadBox6D", "PointHeadSimple",
    "CenterHead", "PointIntraPartOffsetHead",
]
