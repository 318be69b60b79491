"""Loss primitives (JAX).

TPU-native equivalents of the reference's ``model/util.py`` loss helpers.
Everything here is fully vectorized / mask-aware so batched, padded targets
can be used under one compiled step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (stable).

    Matches ``torch.nn.functional.binary_cross_entropy_with_logits`` with
    reduction="none": max(x,0) - x*z + log(1+exp(-|x|)).
    """
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def sigmoid_focal_loss_elementwise(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss. Reference: model/util.py:28-60 (pre-reduction)."""
    prob = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def sigmoid_focal_loss(logits, targets, num_boxes, alpha: float = 0.25, gamma: float = 2.0):
    """Reference reduction: ``loss.mean(1).sum() / num_boxes``
    (model/util.py:59) over [N, Q, C] inputs flattened to [N*Q? no: mean over
    dim 1 then sum]. The detection loss then multiplies by Q
    (egtr.py:648-659); we keep the raw reduction here and let callers scale.
    """
    loss = sigmoid_focal_loss_elementwise(logits, targets, alpha, gamma)
    return loss.mean(axis=1).sum() / num_boxes


def dice_loss(logits, targets, num_boxes):
    """Reference: model/util.py:9-25."""
    inputs = jax.nn.sigmoid(logits)
    inputs = inputs.reshape(inputs.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2 * (inputs * targets).sum(axis=1)
    denominator = inputs.sum(axis=-1) + targets.sum(axis=-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    return loss.sum() / num_boxes
