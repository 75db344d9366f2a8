"""Det6D and 3DSSD/SASA-style single-stage point detectors.

Parity: reference detectors/det6d.py:4-30 (loss = point head only) and
detectors/ssd3d.py. Pipeline: PointNet2FSMSG backbone →
PointHeadBox(6D)Vote.
"""

from __future__ import annotations

from ...registry import DETECTORS
from ...utils import box_coder_utils
from ..dense_heads.point_head_vote import point_vote_head_loss
from .detector3d_template import Detector3DTemplate


class _PointVoteDetector(Detector3DTemplate):
    def _build_coder(self):
        tcfg = self.model_cfg["POINT_HEAD"]["TARGET_CONFIG"]
        return box_coder_utils.build_box_coder(
            tcfg["BOX_CODER"], **dict(tcfg.get("BOX_CODER_CONFIG", {}))
        )

    def get_training_loss(self, batch_dict):
        head_cfg = self.model_cfg["POINT_HEAD"]
        num_class = (
            1 if head_cfg.get("CLASS_AGNOSTIC", False) else self.num_class
        )
        if head_cfg["NAME"] == "PointHeadBox6D":
            # direct-regression ablation head (reference
            # point_head_box6d.py — the paper's D.R. row)
            from ..dense_heads.point_head_box6d import (
                point_head_box6d_loss,
            )

            loss, tb = point_head_box6d_loss(
                batch_dict, head_cfg, num_class, self._build_coder()
            )
        else:
            loss, tb = point_vote_head_loss(
                batch_dict, head_cfg, num_class, self._build_coder()
            )
        tb["loss"] = loss
        return loss, tb


@DETECTORS.register
class Det6D(_PointVoteDetector):
    """Full-pose detector (reference det6d.py)."""


@DETECTORS.register
class SSD3D(_PointVoteDetector):
    """3DSSD / 3DSSD-SASA (reference ssd3d.py) — same spine with the
    7-DoF vote head."""
