"""2-D sine position embedding (JAX).

Reference: ``DeformableDetrSinePositionEmbedding`` (model/deformable_detr.py:
850-876) — cumulative-sum of the pixel mask, normalized, interleaved sin/cos.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_embedding(
    pixel_mask, embedding_dim: int = 128, temperature: float = 10000.0,
    normalize: bool = True, scale: float | None = None,
):
    """pixel_mask: [B, H, W] (1 = valid). Returns [B, H, W, 2*embedding_dim].

    NHWC layout (TPU-native) — the reference returns NCHW.
    """
    if scale is None:
        scale = 2 * math.pi
    mask = pixel_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(mask, axis=1)
    x_embed = jnp.cumsum(mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(embedding_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / embedding_dim)

    pos_x = x_embed[..., None] / dim_t  # [B,H,W,E]
    pos_y = y_embed[..., None] / dim_t
    # interleave sin/cos over pairs: stack(sin(0::2), cos(1::2)) then flatten
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(*pos_x.shape[:-2], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(*pos_y.shape[:-2], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # [B,H,W,2E]


def sine_position_embedding_full(hw, embedding_dim: int = 128,
                                 temperature: float = 10000.0,
                                 scale: float | None = None):
    """Mask-free fast path: the embedding for an all-valid [h, w] image
    (cumsum of ones == index + 1). Returns [1, h, w, 2*embedding_dim] —
    identical to :func:`sine_position_embedding` on a full mask."""
    if scale is None:
        scale = 2 * math.pi
    h, w = hw
    eps = 1e-6
    y = (jnp.arange(1, h + 1, dtype=jnp.float32) - 0.5) / (h + eps) * scale
    x = (jnp.arange(1, w + 1, dtype=jnp.float32) - 0.5) / (w + eps) * scale
    y_embed = jnp.broadcast_to(y[None, :, None], (1, h, w))
    x_embed = jnp.broadcast_to(x[None, None, :], (1, h, w))

    dim_t = jnp.arange(embedding_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / embedding_dim)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(*pos_x.shape[:-2], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(*pos_y.shape[:-2], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
