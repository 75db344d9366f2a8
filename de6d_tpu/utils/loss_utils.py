"""Loss functions (pure jnp, functional — no module state).

Parity targets: /root/reference/core/pcdet/utils/loss_utils.py —
SigmoidFocalClassificationLoss (:10), WeightedSmoothL1Loss (:76),
WeightedL1Loss (:141), WeightedCrossEntropyLoss (:183),
WeightedBinaryCrossEntropyLoss (:211), corner loss (:238),
CenterNet focal/reg (:331,:393), PointSASALoss (:418).

All functions return per-element losses; callers apply weights/sums so
normalization matches the reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import geometry


def sigmoid_bce_with_logits(logits, targets):
    """Numerically-stable sigmoid binary cross-entropy."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def sigmoid_focal_loss(logits, targets, weights=None, alpha=0.25, gamma=2.0):
    """Per-element focal loss (reference SigmoidFocalClassificationLoss).

    logits/targets: (..., C); weights: broadcastable over the anchor
    dim (the reference expands (B, A) weights to (B, A, 1)).
    """
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    pt = targets * (1.0 - p) + (1.0 - targets) * p
    focal_w = alpha_w * jnp.power(pt, gamma)
    loss = focal_w * sigmoid_bce_with_logits(logits, targets)
    if weights is not None:
        if weights.ndim == loss.ndim - 1:
            weights = weights[..., None]
        loss = loss * weights
    return loss


def smooth_l1_loss(pred, target, weights=None, beta: float = 1.0 / 9.0,
                   code_weights=None):
    """Per-code smooth-L1 (reference WeightedSmoothL1Loss). NaN targets
    are replaced by preds (zero loss), matching the reference guard."""
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    n = jnp.abs(diff)
    if beta < 1e-5:
        loss = n
    else:
        loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def l1_loss(pred, target, weights=None, code_weights=None):
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def softmax_cross_entropy(logits, one_hot_targets, weights=None):
    """Reference WeightedCrossEntropyLoss: CE over the last dim with
    per-anchor weights."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(one_hot_targets * logprobs, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def weighted_binary_cross_entropy(logits, targets, weights=None):
    loss = sigmoid_bce_with_logits(logits, targets).mean(axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def get_corner_loss_lidar(pred_boxes, gt_boxes):
    """Corner alignment loss with flipped-gt minimum (reference
    loss_utils.get_corner_loss_lidar:238): huber over the per-corner
    distance, taking min(gt, gt+pi-flipped). boxes (N, 7)."""
    pred_corners = geometry.boxes_to_corners_3d(pred_boxes)
    gt_corners = geometry.boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_corners_flip = geometry.boxes_to_corners_3d(gt_flip)
    d = jnp.linalg.norm(pred_corners - gt_corners, axis=-1)
    d_flip = jnp.linalg.norm(pred_corners - gt_corners_flip, axis=-1)
    dist = jnp.minimum(d, d_flip)  # (N, 8)
    # huber with delta=1
    abs_d = jnp.abs(dist)
    corner_loss = jnp.where(abs_d < 1.0, 0.5 * dist * dist, abs_d - 0.5)
    return corner_loss.mean(axis=1)


def centernet_focal_loss(pred, gt, mask=None):
    """CenterNet gaussian focal loss (reference FocalLossCenterNet /
    neg_loss_cornernet, loss_utils.py:331): pred is post-sigmoid
    heatmap, gt has gaussian-splatted targets."""
    pos_mask = (gt == 1.0).astype(pred.dtype)
    neg_mask = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)
    pred = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos_mask
    neg_loss = (
        jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg_mask
    )
    if mask is not None:
        pos_loss = pos_loss * mask
        neg_loss = neg_loss * mask
    num_pos = jnp.sum(pos_mask)
    pos_loss = jnp.sum(pos_loss)
    neg_loss = jnp.sum(neg_loss)
    return jnp.where(num_pos > 0, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0), -neg_loss)


def centernet_reg_loss(pred, target, mask):
    """L1 regression at peak locations (reference RegLossCenterNet,
    loss_utils.py:393). pred/target: (B, K, C); mask: (B, K)."""
    m = mask.astype(pred.dtype)[..., None]
    loss = jnp.abs(pred * m - target * m)
    return jnp.sum(loss, axis=(0, 1)) / jnp.maximum(jnp.sum(m), 1.0)
