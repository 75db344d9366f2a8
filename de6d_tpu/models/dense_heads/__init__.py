from .anchor_head import AnchorHeadSingle
from .point_head_vote import PointHeadBoxVote, PointHeadBox6DVote
from .point_head_box import PointHeadBox, PointHeadSimple

__all__ = ["AnchorHeadSingle", "PointHeadBoxVote", "PointHeadBox6DVote", "PointHeadBox", "PointHeadSimple"]
