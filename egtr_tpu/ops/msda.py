"""Multi-scale deformable attention — pure-JAX core.

TPU-native re-design of the reference CUDA kernel
(model/custom_kernel/cuda/ms_deform_im2col_cuda.cuh:237-299) and its debug
PyTorch twin ``ms_deform_attn_core_pytorch`` (model/deformable_detr.py:925-960).

Semantics: sampling locations are normalized to [0,1]; the pixel-space sample
point is ``loc * size - 0.5`` (identical to ``F.grid_sample(align_corners=
False)`` with grid ``2*loc-1``); bilinear interpolation with zero padding
outside the feature map. Attention weights are already softmaxed over
(levels x points).

Spatial shapes are STATIC (python tuple) — images are padded to bucketed
shapes so the whole model compiles once per bucket. This turns all level
slicing/offsets into compile-time constants, which is what lets XLA lay the
gathers out efficiently.

Shapes:
    value:              [B, S, H, D]   (S = sum of h*w over levels)
    sampling_locations: [B, Q, H, L, P, 2]  (x, y) in [0, 1]
    attention_weights:  [B, Q, H, L, P]
    returns:            [B, Q, H*D]
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _gather_level(value_l, ix, iy, w, h):
    """Bilinear sample one level.

    value_l: [B, S_l, H, D] flattened (row-major y*w + x)
    ix, iy:  [B, Q, H, P] pixel-space (already loc*size-0.5)
    returns  [B, Q, H, P, D]
    """
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    # corner integer coords
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # bilinear lambdas
    lx = ix - x0
    ly = iy - y0
    hx = 1.0 - lx
    hy = 1.0 - ly

    B, S_l, H, D = value_l.shape
    # [B, H, S_l, D] so we can gather along axis=2 per head
    v = jnp.swapaxes(value_l, 1, 2)

    def corner(xc, yc, wgt):
        # validity under zero padding
        valid = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
        idx = jnp.clip(yc, 0, h - 1) * w + jnp.clip(xc, 0, w - 1)  # [B,Q,H,P]
        idx = jnp.swapaxes(idx, 1, 2)  # [B,H,Q,P]
        Bq = idx.shape
        flat = idx.reshape(B, H, -1)  # [B,H,Q*P]
        g = jnp.take_along_axis(v, flat[..., None], axis=2)  # [B,H,Q*P,D]
        g = g.reshape(B, H, Bq[2], Bq[3], D)  # [B,H,Q,P,D]
        wgt = jnp.where(valid, wgt, 0.0)  # [B,Q,H,P]
        wgt = jnp.swapaxes(wgt, 1, 2)[..., None]  # [B,H,Q,P,1]
        return g * wgt

    out = (
        corner(x0i, y0i, hx * hy)
        + corner(x0i + 1, y0i, lx * hy)
        + corner(x0i, y0i + 1, hx * ly)
        + corner(x0i + 1, y0i + 1, lx * ly)
    )  # [B,H,Q,P,D]
    return jnp.swapaxes(out, 1, 2)  # [B,Q,H,P,D]


def ms_deform_attn(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Pure-JAX multi-scale deformable attention (forward; differentiable).

    Gradients flow through bilinear weights to value, sampling_locations and
    attention_weights, matching the CUDA col2im backward
    (ms_deform_im2col_cuda.cuh:301-922) semantics via JAX autodiff.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    dtype = value.dtype
    out = jnp.zeros((B, Q, H, D), dtype=jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        loc = sampling_locations[:, :, :, lid]  # [B,Q,H,P,2]
        ix = loc[..., 0] * w - 0.5
        iy = loc[..., 1] * h - 0.5
        sampled = _gather_level(value_l, ix, iy, w, h)  # [B,Q,H,P,D]
        aw = attention_weights[:, :, :, lid][..., None]  # [B,Q,H,P,1]
        out = out + (sampled * aw).sum(axis=3).astype(jnp.float32)
        start += h * w
    return out.reshape(B, Q, H * D).astype(dtype)
