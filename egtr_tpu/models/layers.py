"""Transformer building blocks (flax.linen).

TPU-native re-implementations of the reference layer zoo:
- :class:`MLPHead`           — DeformableDetrMLPPredictionHead (deformable_detr.py:2865-2883)
- :class:`MultiheadAttention`— decoder self-attention exposing scaled Q / K
                               (deformable_detr.py:1107-1262)
- :class:`MSDeformableAttention` — linear sampling heads + pure-JAX /
                               Pallas core (deformable_detr.py:963-1104)
- :class:`EncoderLayer` / :class:`DecoderLayer`
                               (deformable_detr.py:1265-1489)

Default Dense init mirrors HF ``_init_weights`` (deformable_detr.py:1518-1540):
normal(std=0.02) weights, zero bias, with the MSDA directional-offset
exception.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops.msda import ms_deform_attn

default_kernel_init = nn.initializers.normal(stddev=0.02)


def dense(features: int, name: str, kernel_init=default_kernel_init,
          bias_init=nn.initializers.zeros, dtype=None):
    return nn.Dense(features, kernel_init=kernel_init, bias_init=bias_init,
                    dtype=dtype, name=name)


# FFN activation (the config's ``activation_function``; reference ACT2FN
# at deformable_detr.py:1297,1396). torch's "gelu" is the exact erf form —
# flax's default is the tanh approximation, so approximate=False matters.
ACT_FN = {
    "relu": nn.relu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "silu": nn.silu,
}


def layer_norm(x, name: str, dtype=None):
    """LayerNorm with fp32 statistics; output cast back to the compute
    dtype (standard bf16-training practice). epsilon matches torch's
    1e-5 default (flax defaults to 1e-6 — measured as the round-2 parity
    gap vs the reference, amplified where activations are small)."""
    y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)(x)
    return y.astype(dtype) if dtype is not None else y.astype(x.dtype)


class MLPHead(nn.Module):
    """n-layer ReLU MLP (bbox / relation / connectivity heads).

    Reference: deformable_detr.py:2865-2883.
    ``final_kernel_zero``/``final_bias`` support the bbox-head init hack
    (egtr.py:138-148: last-layer weight zero, bias[2:] = -2).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    final_kernel_zero: bool = False
    final_bias: Optional[Tuple[float, ...]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(dense(self.hidden_dim, f"layers_{i}",
                              dtype=self.dtype)(x))
        if self.final_kernel_zero:
            kinit = nn.initializers.zeros
        else:
            kinit = default_kernel_init
        if self.final_bias is not None:
            fb = jnp.asarray(self.final_bias, jnp.float32)
            binit = lambda key, shape, dtype=jnp.float32: jnp.broadcast_to(fb, shape).astype(dtype)
        else:
            binit = nn.initializers.zeros
        return nn.Dense(self.output_dim, kernel_init=kinit, bias_init=binit,
                        dtype=self.dtype,
                        name=f"layers_{self.num_layers - 1}")(x)


class MultiheadAttention(nn.Module):
    """Self-attention over object queries, exposing per-head scaled Q and K.

    The (q, k) by-products are the EGTR relation signal
    (deformable_detr.py:1179-1189): Q is post-scaling (q_proj(x) * d_h^-0.5),
    K is the raw k_proj output, both reshaped [B, heads, Q, d_head].
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, hidden_states, position_embeddings=None,
                 deterministic: bool = True):
        B, Q, E = hidden_states.shape
        H = self.num_heads
        Dh = E // H
        scaling = Dh ** -0.5

        hs_pos = hidden_states if position_embeddings is None else (
            hidden_states + position_embeddings
        )
        q = dense(E, "q_proj", dtype=self.dtype)(hs_pos) * scaling
        k = dense(E, "k_proj", dtype=self.dtype)(hs_pos)
        v = dense(E, "v_proj", dtype=self.dtype)(hidden_states)

        def shape(t):  # [B,Q,E] -> [B,H,Q,Dh]
            return t.reshape(B, Q, H, Dh).transpose(0, 2, 1, 3)

        qh, kh, vh = shape(q), shape(k), shape(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(B, Q, E)
        out = dense(E, "out_proj", dtype=self.dtype)(out)
        return out, qh, kh


def _msda_offset_bias_init(num_heads: int, n_levels: int, n_points: int):
    """Directional init of sampling offsets (deformable_detr.py:999-1019)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H,2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape
        return jnp.asarray(flat, dtype)

    return init


class MSDeformableAttention(nn.Module):
    """Multi-scale deformable attention module.

    Reference: DeformableDetrMultiscaleDeformableAttention
    (deformable_detr.py:963-1104). ``spatial_shapes`` is a static tuple.
    """

    d_model: int
    num_heads: int
    n_levels: int
    n_points: int
    dtype: Optional[jnp.dtype] = None
    msda_impl: str = "auto"
    # opt-in banded approximation (ops/msda_window.py); only set where the
    # queries are raster-ordered (encoder self-attention)
    window: int = 0
    # band-selection granularity: "tile" or "point" (per sampling point)
    band: str = "tile"
    # opt-in int8 stage-1 (ops/msda_pallas.py msda_pallas_q)
    int8: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states,            # [B, Q, E] queries
        encoder_hidden_states,    # [B, S, E] value source
        reference_points,         # [B, Q, L, 2] or [B, Q, L, 4]
        spatial_shapes: Sequence[Tuple[int, int]],
        position_embeddings=None,
        value_mask=None,          # [B, S] bool, True = valid
        query_segments=None,      # raster (h, w) layout of the queries
    ):
        H, L, P = self.num_heads, self.n_levels, self.n_points
        E = self.d_model
        B, Q, _ = hidden_states.shape
        S = encoder_hidden_states.shape[1]

        hs = hidden_states if position_embeddings is None else (
            hidden_states + position_embeddings
        )

        value = dense(E, "value_proj", dtype=self.dtype,
                      kernel_init=nn.initializers.xavier_uniform())(
            encoder_hidden_states)
        if value_mask is not None:
            value = jnp.where(value_mask[..., None], value, 0.0)
        value = value.reshape(B, S, H, E // H)

        offsets = nn.Dense(
            H * L * P * 2, kernel_init=nn.initializers.zeros,
            bias_init=_msda_offset_bias_init(H, L, P), dtype=jnp.float32,
            name="sampling_offsets",
        )(hs).reshape(B, Q, H, L, P, 2)
        weights = nn.Dense(
            H * L * P, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=jnp.float32,
            name="attention_weights",
        )(hs).reshape(B, Q, H, L * P)
        weights = jax.nn.softmax(weights, axis=-1).reshape(B, Q, H, L, P)

        if reference_points.shape[-1] == 2:
            # normalize offsets by (w, h) per level (deformable_detr.py:1066-1073)
            wh = jnp.asarray([[w, h] for (h, w) in spatial_shapes],
                             dtype=offsets.dtype)  # [L, 2]
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / wh[None, None, None, :, None, :])
        elif reference_points.shape[-1] == 4:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5)
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(
            value, tuple(spatial_shapes), loc,
            weights.astype(value.dtype), impl=self.msda_impl,
            window=self.window, query_segments=query_segments,
            int8=self.int8, band=self.band)
        # under remat_policy="dots" the kernel output is saved (not
        # recomputed) in the backward pass; no-op otherwise
        out = checkpoint_name(out, "msda")
        out = dense(E, "output_proj", dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform())(out)
        return out


class EncoderLayer(nn.Module):
    """MSDA self-attention + FFN. Reference: deformable_detr.py:1265-1358."""

    d_model: int
    ffn_dim: int
    num_heads: int
    n_levels: int
    n_points: int
    dropout: float = 0.1
    activation_dropout: float = 0.0
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None
    msda_impl: str = "auto"
    msda_window: int = 0
    msda_band: str = "tile"
    msda_int8: bool = False

    @nn.compact
    def __call__(self, hidden_states, position_embeddings, reference_points,
                 spatial_shapes, value_mask=None, deterministic: bool = True):
        residual = hidden_states
        # encoder queries ARE the raster-flattened tokens, so they qualify
        # for the windowed approximation with segments = spatial_shapes
        hidden_states = MSDeformableAttention(
            self.d_model, self.num_heads, self.n_levels, self.n_points,
            dtype=self.dtype, msda_impl=self.msda_impl,
            window=self.msda_window, band=self.msda_band,
            int8=self.msda_int8,
            name="self_attn",
        )(hidden_states, hidden_states, reference_points, spatial_shapes,
          position_embeddings=position_embeddings, value_mask=value_mask,
          query_segments=spatial_shapes if self.msda_window else None)
        hidden_states = nn.Dropout(self.dropout)(hidden_states, deterministic)
        hidden_states = layer_norm(residual + hidden_states,
                                   "self_attn_layer_norm", self.dtype)

        residual = hidden_states
        hidden_states = ACT_FN[self.activation](
            dense(self.ffn_dim, "fc1", dtype=self.dtype)(hidden_states))
        hidden_states = nn.Dropout(self.activation_dropout)(
            hidden_states, deterministic)
        hidden_states = dense(self.d_model, "fc2",
                              dtype=self.dtype)(hidden_states)
        hidden_states = nn.Dropout(self.dropout)(hidden_states, deterministic)
        hidden_states = layer_norm(residual + hidden_states,
                                   "final_layer_norm", self.dtype)
        if not deterministic and hidden_states.dtype == jnp.float16:
            # fp16 overflow clamp (deformable_detr.py:1346-1351). bf16 — the
            # TPU-native compute dtype — shares the fp32 exponent range, so
            # the clamp is a no-op there and only applies when someone runs
            # the model in fp16.
            clamp = float(jnp.finfo(jnp.float16).max) - 1000.0
            hidden_states = jnp.clip(hidden_states, -clamp, clamp)
        return hidden_states


class DecoderLayer(nn.Module):
    """Query self-attention (with q/k capture) -> MSDA cross-attention -> FFN.

    Reference: deformable_detr.py:1361-1489. Returns (hidden, q, k) where
    q/k are the per-head attention states [B, H, Q, d_head].
    """

    d_model: int
    ffn_dim: int
    num_heads: int
    n_levels: int
    n_points: int
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None
    msda_impl: str = "auto"
    msda_int8: bool = False

    @nn.compact
    def __call__(self, hidden_states, query_pos, encoder_hidden_states,
                 reference_points, spatial_shapes, value_mask=None,
                 deterministic: bool = True):
        residual = hidden_states
        hidden_states, q, k = MultiheadAttention(
            self.d_model, self.num_heads, self.attention_dropout,
            dtype=self.dtype, name="self_attn",
        )(hidden_states, position_embeddings=query_pos,
          deterministic=deterministic)
        hidden_states = nn.Dropout(self.dropout)(hidden_states, deterministic)
        hidden_states = layer_norm(residual + hidden_states,
                                   "self_attn_layer_norm", self.dtype)

        residual = hidden_states
        hidden_states = MSDeformableAttention(
            self.d_model, self.num_heads, self.n_levels, self.n_points,
            dtype=self.dtype, msda_impl=self.msda_impl,
            int8=self.msda_int8, name="encoder_attn",
        )(hidden_states, encoder_hidden_states, reference_points,
          spatial_shapes, position_embeddings=query_pos,
          value_mask=value_mask)
        hidden_states = nn.Dropout(self.dropout)(hidden_states, deterministic)
        hidden_states = layer_norm(residual + hidden_states,
                                   "encoder_attn_layer_norm", self.dtype)

        residual = hidden_states
        hidden_states = ACT_FN[self.activation](
            dense(self.ffn_dim, "fc1", dtype=self.dtype)(hidden_states))
        hidden_states = nn.Dropout(self.activation_dropout)(
            hidden_states, deterministic)
        hidden_states = dense(self.d_model, "fc2",
                              dtype=self.dtype)(hidden_states)
        hidden_states = nn.Dropout(self.dropout)(hidden_states, deterministic)
        hidden_states = layer_norm(residual + hidden_states,
                                   "final_layer_norm", self.dtype)
        return hidden_states, q, k
