from .anchor_head import AnchorHeadSingle
from .point_head_vote import PointHeadBoxVote, PointHeadBox6DVote

__all__ = ["AnchorHeadSingle", "PointHeadBoxVote", "PointHeadBox6DVote"]
