"""Box coders (pure jnp, stateless).

Parity targets (/root/reference/core/pcdet/utils/box_coder_utils.py):
- ResidualCoder (:5)               7-DoF anchor residuals (+sincos opt)
- ResidualCoderFull (:315)         9-DoF anchor residuals
- PointResidualCoder (:144)        8-dim point-to-box (cos/sin yaw)
- PointResidualCoder6D (:227)      12-dim point-to-box, sincos all angles
- PointBinResidualCoder (:403)     yaw bin cls+res (6 + 2*bins)
- PointBinResidual6DCoder (:546)   Det6D ground-aware full-pose coder:
    yaw bin cls+res + {pitch-beyond-threshold cls, normalized pitch
    residual}; decode zeroes pitch when sigmoid(cls)<0.5 and roll is
    always 0 at inference (:622-637).

All encode/decode are functional; no in-place mutation (the reference
clamps sizes in place — we clamp on a copy).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..registry import BOX_CODERS


@BOX_CODERS.register
class ResidualCoder:
    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """boxes/anchors: (..., 7+C) → (..., code_size)."""
        anchors = anchors.at[..., 3:6].set(
            jnp.clip(anchors[..., 3:6], 1e-5, None)
        )
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], 1e-5, None))
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = boxes[..., 3], boxes[..., 4], boxes[..., 5]
        rg = boxes[..., 6]

        diag = jnp.sqrt(dxa**2 + dya**2)
        parts = [
            (xg - xa) / diag,
            (yg - ya) / diag,
            (zg - za) / dza,
            jnp.log(dxg / dxa),
            jnp.log(dyg / dya),
            jnp.log(dzg / dza),
        ]
        if self.encode_angle_by_sincos:
            parts += [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            parts += [rg - ra]
        extras = [boxes[..., i] - anchors[..., i] for i in range(7, boxes.shape[-1])]
        return jnp.stack(parts + extras, axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        ra = anchors[..., 6]
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]

        diag = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(
                encodings[..., 7] + jnp.sin(ra), encodings[..., 6] + jnp.cos(ra)
            )
            extra_start = 8
        else:
            rg = encodings[..., 6] + ra
            extra_start = 7
        extras = [
            encodings[..., extra_start + i] + anchors[..., 7 + i]
            for i in range(anchors.shape[-1] - 7)
        ]
        return jnp.stack(
            [xg, yg, zg, dxg, dyg, dzg, rg] + extras, axis=-1
        )


@BOX_CODERS.register
class ResidualCoderFull:
    """9-DoF anchor residual coder (reference :315-400)."""

    def __init__(self, code_size=9, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size + (3 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        anchors = anchors.at[..., 3:6].set(
            jnp.clip(anchors[..., 3:6], 1e-5, None)
        )
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], 1e-5, None))
        diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
        parts = [
            (boxes[..., 0] - anchors[..., 0]) / diag,
            (boxes[..., 1] - anchors[..., 1]) / diag,
            (boxes[..., 2] - anchors[..., 2]) / anchors[..., 5],
            jnp.log(boxes[..., 3] / anchors[..., 3]),
            jnp.log(boxes[..., 4] / anchors[..., 4]),
            jnp.log(boxes[..., 5] / anchors[..., 5]),
        ]
        for i in (6, 7, 8):
            if self.encode_angle_by_sincos:
                parts += [
                    jnp.cos(boxes[..., i]) - jnp.cos(anchors[..., i]),
                    jnp.sin(boxes[..., i]) - jnp.sin(anchors[..., i]),
                ]
            else:
                parts += [boxes[..., i] - anchors[..., i]]
        extras = [
            boxes[..., i] - anchors[..., i] for i in range(9, boxes.shape[-1])
        ]
        return jnp.stack(parts + extras, axis=-1)

    def decode(self, encodings, anchors):
        diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
        out = [
            encodings[..., 0] * diag + anchors[..., 0],
            encodings[..., 1] * diag + anchors[..., 1],
            encodings[..., 2] * anchors[..., 5] + anchors[..., 2],
            jnp.exp(encodings[..., 3]) * anchors[..., 3],
            jnp.exp(encodings[..., 4]) * anchors[..., 4],
            jnp.exp(encodings[..., 5]) * anchors[..., 5],
        ]
        if self.encode_angle_by_sincos:
            for k, i in enumerate((6, 7, 8)):
                cos_t = encodings[..., 6 + 2 * k]
                sin_t = encodings[..., 7 + 2 * k]
                out.append(
                    jnp.arctan2(
                        sin_t + jnp.sin(anchors[..., i]),
                        cos_t + jnp.cos(anchors[..., i]),
                    )
                )
            extra_start = 12
        else:
            for i in (6, 7, 8):
                out.append(encodings[..., i] + anchors[..., i])
            extra_start = 9
        for i in range(anchors.shape[-1] - 9):
            out.append(encodings[..., extra_start + i] + anchors[..., 9 + i])
        return jnp.stack(out, axis=-1)


def _point_offsets_encode(gt_boxes, points, mean_size, gt_classes):
    """Shared xyz/size residuals of the point coders."""
    xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
    if mean_size is not None:
        anchor = jnp.asarray(mean_size)[gt_classes - 1]  # (N, 3)
        dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
        diag = jnp.sqrt(dxa**2 + dya**2)
        return [
            (gt_boxes[..., 0] - xa) / diag,
            (gt_boxes[..., 1] - ya) / diag,
            (gt_boxes[..., 2] - za) / dza,
            jnp.log(gt_boxes[..., 3] / dxa),
            jnp.log(gt_boxes[..., 4] / dya),
            jnp.log(gt_boxes[..., 5] / dza),
        ]
    return [
        gt_boxes[..., 0] - xa,
        gt_boxes[..., 1] - ya,
        gt_boxes[..., 2] - za,
        jnp.log(gt_boxes[..., 3]),
        jnp.log(gt_boxes[..., 4]),
        jnp.log(gt_boxes[..., 5]),
    ]


def _point_offsets_decode(offsets, points, mean_size, pred_classes):
    xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
    xt, yt, zt = offsets[..., 0], offsets[..., 1], offsets[..., 2]
    dxt, dyt, dzt = offsets[..., 3], offsets[..., 4], offsets[..., 5]
    if mean_size is not None:
        anchor = jnp.asarray(mean_size)[pred_classes - 1]
        dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
        diag = jnp.sqrt(dxa**2 + dya**2)
        return [
            xt * diag + xa,
            yt * diag + ya,
            zt * dza + za,
            jnp.exp(dxt) * dxa,
            jnp.exp(dyt) * dya,
            jnp.exp(dzt) * dza,
        ]
    return [
        xt + xa, yt + ya, zt + za,
        jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt),
    ]


class _PointCoderBase:
    def __init__(self, use_mean_size=True, mean_size=None, **kwargs):
        self.use_mean_size = use_mean_size
        if use_mean_size:
            # host numpy, NOT jnp: coders are built inside flax setup(),
            # which can run under a jit trace (e.g. jitted model.init in
            # create_train_state) where jnp.asarray would stage the
            # constant into a tracer and float()/assert would fail
            self.mean_size = np.asarray(mean_size, dtype=np.float32)
            assert float(self.mean_size.min()) > 0
        else:
            self.mean_size = None


@BOX_CODERS.register
class PointResidualCoder(_PointCoderBase):
    """8-dim point-to-box coder with cos/sin yaw (reference :144)."""

    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        super().__init__(use_mean_size, **kwargs)
        self.code_size = code_size

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = gt_boxes.at[..., 3:6].set(
            jnp.clip(gt_boxes[..., 3:6], 1e-5, None)
        )
        parts = _point_offsets_encode(
            gt_boxes, points, self.mean_size, gt_classes
        )
        rg = gt_boxes[..., 6]
        parts += [jnp.cos(rg), jnp.sin(rg)]
        extras = [gt_boxes[..., i] for i in range(7, gt_boxes.shape[-1])]
        return jnp.stack(parts + extras, axis=-1)

    def decode(self, encodings, points, pred_classes=None):
        out = _point_offsets_decode(
            encodings, points, self.mean_size, pred_classes
        )
        out.append(jnp.arctan2(encodings[..., 7], encodings[..., 6]))
        for i in range(8, encodings.shape[-1]):
            out.append(encodings[..., i])
        return jnp.stack(out, axis=-1)


def encode_angle_to_bins(angle, num_bins: int):
    """Angle → (one-hot bin cls, per-bin normalized residual in
    [-0.5, 0.5]) — reference PointBinResidualCoder.encode_angle_torch
    (:415-437)."""
    two_pi = 2.0 * jnp.pi
    per = two_pi / num_bins
    angle = jnp.mod(angle, two_pi)
    shifted = jnp.mod(angle + per / 2.0, two_pi)
    cls_f = jnp.floor(shifted / per)
    cls_onehot = jax.nn.one_hot(cls_f.astype(jnp.int32), num_bins)
    res = (shifted - (cls_f * per + per / 2.0)) / per
    res = cls_onehot * res[..., None]
    return cls_onehot, res


def decode_angle_from_bins(cls_logits, res):
    """(.., bins) cls scores/logits + residuals → angle (reference
    decode_angle_torch :439-453)."""
    num_bins = cls_logits.shape[-1]
    idx = jnp.argmax(cls_logits, axis=-1)
    onehot = jax.nn.one_hot(idx, num_bins)
    res_sel = jnp.sum(onehot * res, axis=-1)
    return (idx.astype(res.dtype) + res_sel) * (2.0 * jnp.pi / num_bins)


@BOX_CODERS.register
class PointBinResidualCoder(_PointCoderBase):
    """Yaw bin cls+res point coder (reference :403), used by
    PointHeadBoxVote (3DSSD/SASA)."""

    def __init__(self, use_mean_size=True, angle_bin_num=12, pred_velo=False,
                 **kwargs):
        super().__init__(use_mean_size, **kwargs)
        self.angle_bin_num = angle_bin_num
        self.pred_velo = pred_velo
        self.code_size = 6 + 2 * angle_bin_num + (2 if pred_velo else 0)

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = gt_boxes.at[..., 3:6].set(
            jnp.clip(gt_boxes[..., 3:6], 1e-5, None)
        )
        parts = _point_offsets_encode(
            gt_boxes, points, self.mean_size, gt_classes
        )
        cls_oh, res = encode_angle_to_bins(gt_boxes[..., 6], self.angle_bin_num)
        extras = [gt_boxes[..., i] for i in range(7, gt_boxes.shape[-1])]
        return jnp.concatenate(
            [jnp.stack(parts, -1), cls_oh, res]
            + ([jnp.stack(extras, -1)] if extras else []),
            axis=-1,
        )

    def decode(self, encodings, points, pred_classes=None):
        nb = self.angle_bin_num
        out = _point_offsets_decode(
            encodings, points, self.mean_size, pred_classes
        )
        rg = decode_angle_from_bins(
            encodings[..., 6 : 6 + nb], encodings[..., 6 + nb : 6 + 2 * nb]
        )
        out.append(rg)
        rest = encodings[..., 6 + 2 * nb :]
        return jnp.concatenate([jnp.stack(out, -1), rest], axis=-1)


@BOX_CODERS.register
class PointBinResidual6DCoder(_PointCoderBase):
    """Det6D ground-aware full-pose coder (reference :546-737).

    Code layout: [6 offsets | yaw bin cls ×B | yaw bin res ×B |
    pitch cls, pitch res (ground_aware) or pitch (direct)].
    Ground-aware encoding: pitch below -threshold ⇒ cls=1 and
    res=(-threshold - pitch)/factor, else cls=0, res=0. Decode zeroes
    pitch when sigmoid(cls) < 0.5; roll is always decoded as 0.
    """

    def __init__(self, use_mean_size=True, ground_aware=True,
                 angle_bin_num=12, minus=False, threshold=10, factor=45,
                 **kwargs):
        super().__init__(use_mean_size, **kwargs)
        self.ground_aware = ground_aware
        self.angle_bin_num = angle_bin_num
        self.minus = minus
        self.ground_threshold = float(np.deg2rad(threshold))
        self.ground_factor = float(np.deg2rad(factor))
        self.code_size = 6 + 2 * angle_bin_num + (2 if ground_aware else 1)

    def encode_pitch(self, pitch):
        """→ (cls {0,1}, res) under ground-aware coding, or (pitch,)"""
        if not self.ground_aware:
            return (pitch,)
        if self.minus:
            cls = jnp.abs(pitch) > self.ground_threshold
            res = jnp.where(cls, pitch / self.ground_factor, 0.0)
        else:
            cls = pitch < -self.ground_threshold
            res = jnp.where(
                cls, (-self.ground_threshold - pitch) / self.ground_factor, 0.0
            )
        return cls.astype(pitch.dtype), res

    def decode_pitch_roll(self, code):
        """code: (N, 2|1) → (pitch, roll) with inference-time gating."""
        if self.ground_aware:
            cls_logit, res = code[..., 0], code[..., 1]
            if self.minus:
                pitch = res * self.ground_factor
            else:
                pitch = -self.ground_threshold - res * self.ground_factor
            pitch = jnp.where(jax.nn.sigmoid(cls_logit) < 0.5, 0.0, pitch)
        else:
            pitch = code[..., 0]
        return pitch, jnp.zeros_like(pitch)

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = gt_boxes.at[..., 3:6].set(
            jnp.clip(gt_boxes[..., 3:6], 1e-5, None)
        )
        parts = _point_offsets_encode(
            gt_boxes, points, self.mean_size, gt_classes
        )
        cls_oh, res = encode_angle_to_bins(gt_boxes[..., 6], self.angle_bin_num)
        pitch_code = self.encode_pitch(gt_boxes[..., 7])
        return jnp.concatenate(
            [jnp.stack(parts, -1), cls_oh, res]
            + [p[..., None] for p in pitch_code],
            axis=-1,
        )

    def decode(self, encodings, points, pred_classes=None):
        nb = self.angle_bin_num
        out = _point_offsets_decode(
            encodings, points, self.mean_size, pred_classes
        )
        rz = decode_angle_from_bins(
            encodings[..., 6 : 6 + nb], encodings[..., 6 + nb : 6 + 2 * nb]
        )
        pitch, roll = self.decode_pitch_roll(encodings[..., 6 + 2 * nb :])
        return jnp.stack(out + [rz, pitch, roll], axis=-1)


@BOX_CODERS.register
class PointResidualCoder6D(_PointCoderBase):
    """Direct-regression 6-DoF point coder, sincos on all three angles
    (reference :227-312) — the D.R. ablation variant."""

    def __init__(self, code_size=12, use_mean_size=True, **kwargs):
        super().__init__(use_mean_size, **kwargs)
        self.code_size = code_size

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = gt_boxes.at[..., 3:6].set(
            jnp.clip(gt_boxes[..., 3:6], 1e-5, None)
        )
        parts = _point_offsets_encode(
            gt_boxes, points, self.mean_size, gt_classes
        )
        for i in (6, 7, 8):
            parts += [jnp.cos(gt_boxes[..., i]), jnp.sin(gt_boxes[..., i])]
        return jnp.stack(parts, axis=-1)

    def decode(self, encodings, points, pred_classes=None):
        out = _point_offsets_decode(
            encodings, points, self.mean_size, pred_classes
        )
        for k in range(3):
            out.append(
                jnp.arctan2(encodings[..., 7 + 2 * k], encodings[..., 6 + 2 * k])
            )
        return jnp.stack(out, axis=-1)


def build_box_coder(name: str, **kwargs):
    return BOX_CODERS.get(name)(**kwargs)


@BOX_CODERS.register
class PointResidual_BinOri_Coder(_PointCoderBase):
    """IA-SSD bin-orientation point coder (reference :740-836).

    Encode emits [6 offsets, bin_id, bin_res] (8 values); the head
    expands the angle slots to 2*bin_size logits/residuals, and decode
    consumes the expanded (6 + 2*bin_size) layout with residuals
    normalized to [-1, 1] of a half bin.
    """

    def __init__(self, code_size=8, use_mean_size=True, bin_size=12,
                 **kwargs):
        super().__init__(use_mean_size, **kwargs)
        self.bin_size = int(bin_size)
        self.code_size = 6 + 2 * self.bin_size
        self.bin_inter = 2 * jnp.pi / self.bin_size

    def encode(self, gt_boxes, points, gt_classes=None):
        gt_boxes = gt_boxes.at[..., 3:6].set(
            jnp.clip(gt_boxes[..., 3:6], 1e-5, None)
        )
        parts = _point_offsets_encode(
            gt_boxes, points, self.mean_size, gt_classes
        )
        rg = jnp.clip(
            gt_boxes[..., 6], -jnp.pi + 1e-5, jnp.pi - 1e-5
        )
        bin_id = jnp.floor((rg + jnp.pi) / self.bin_inter)
        bin_res = (
            (rg + jnp.pi) - (bin_id * self.bin_inter + self.bin_inter / 2)
        ) / (self.bin_inter / 2)
        # one-hot/bin-aligned layout matching the head's prediction
        oh = jax.nn.one_hot(bin_id.astype(jnp.int32), self.bin_size)
        res = oh * bin_res[..., None]
        return jnp.concatenate([jnp.stack(parts, -1), oh, res], axis=-1)

    def decode(self, encodings, points, pred_classes=None):
        out = _point_offsets_decode(
            encodings, points, self.mean_size, pred_classes
        )
        nb = self.bin_size
        bin_logits = encodings[..., 6 : 6 + nb]
        bin_res = encodings[..., 6 + nb : 6 + 2 * nb]
        bin_id = jnp.argmax(bin_logits, axis=-1)
        oh = jax.nn.one_hot(bin_id, nb)
        res = jnp.sum(bin_res * oh, axis=-1)
        rg = (
            bin_id.astype(res.dtype) * self.bin_inter - jnp.pi
            + self.bin_inter / 2 + res * (self.bin_inter / 2)
        )
        return jnp.stack(out + [rg], axis=-1)
