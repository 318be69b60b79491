"""Fused Pallas TPU kernel for multi-scale deformable attention.

Same separable-hat math as ``msda._msda_matmul`` (see that module's
docstring; reference semantics: model/custom_kernel/cuda/
ms_deform_im2col_cuda.cuh:237-299), but stage 2 consumes stage 1's MXU tile
directly in VMEM, so the [rows, h*D] intermediate never touches HBM. A
custom VJP recomputes the hat vectors in the backward pass from the raw
(value, locations, weights) residuals — training memory is O(inputs); the
reference CUDA kernel achieves the same by re-deriving bilinear weights in
col2im (ms_deform_im2col_cuda.cuh:324-434).

Kernel layout per level (static spatial shape (h, w), head dim D):

  grid = (B, H, row_tiles); rows r enumerate (query, point) pairs, point
  minor, padded to a tile multiple with zero attention weight.

  forward tile:
    hx  = relu(1 - |ix_r - iota_x|)            [TR, w]   (VPU, analytic)
    T   = hx @ Vt                              [TR, h'D] (MXU; Vt = x-major
                                                          values, h padded
                                                          so h'D % 128 == 0)
    w2  = relu(1 - |iy_r - lane//D|) * aw_r    [TR, h'D] (VPU, built at full
                                                          lane width - no
                                                          repeat/reshape)
    out = fold(T * w2)                         [TQ, D]   (static 128-lane
                                                          partial sums, then
                                                          a point-sum over
                                                          the sublane axis)

  backward tile (3 plain MXU dots, all standard orientation):
    dT   = w2 * tile(g)          dVt += hxT @ dT        dhx = dT @ VtT
    dix  = sum_x dhx * d(hx)/d(ix)   (VPU row reduce)
    T    = hx @ Vt (recomputed)      daw/diy = full-lane VPU reduces

All in-kernel ops are iota/compare/multiply/static-slice/plain-dot — no
dynamic indexing, which Mosaic cannot lower on TPU (measured round 1).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True to run kernels through the Pallas interpreter (CPU testing).
INTERPRET = False

_LANES = 128


def _interpret() -> bool:
    return INTERPRET or jax.default_backend() == "cpu"


def msda_pallas_supported() -> bool:
    """Mosaic lowering available (or interpreter forced for tests)."""
    return INTERPRET or jax.default_backend() != "cpu"


def _row_tile(P: int) -> int:
    # multiple of P (point-sum stays in-tile) and of 8 sublanes; also the
    # row-padding granularity of _level_inputs, so every per-kernel tile
    # size below must divide this
    return max(2 * _LANES * P, 256)


def _fit_tile(P: int, N: int, n_bufs: int, budget=13 * 2 ** 20) -> int:
    """Largest row tile (divisor of _row_tile) whose ~n_bufs live
    [TR, N] f32 temporaries fit the VMEM budget. Coefficients calibrated
    on-chip at N=2432: fwd TR=512 and bwd TR=256 compile; bwd TR=512
    overflows (measured 21.9 MB scoped vs the 16 MB limit)."""
    tr = _row_tile(P)
    while tr > max(P, 8) and n_bufs * tr * N * 4 > budget:
        tr //= 2
    return max(tr, P)


def _row_tile_fwd(P: int, N: int) -> int:
    # forward keeps ~1 live [TR, N] f32 tile (T; stage 2 consumes it in
    # static 128-lane slices, never materializing w2 or T*w2 full-width)
    return _fit_tile(P, N, 1)


def _row_tile_bwd(P: int, N: int) -> int:
    # backward keeps ~4.5 live [TR, N] f32 temporaries (hy/g_tile/dT/T/Tg
    # minus what Mosaic fuses); 5 is the safe integer envelope
    return _fit_tile(P, N, 5)


def _h_pad(h: int, D: int) -> int:
    """Pad h so h_pad * D is a multiple of 128 (static 128-lane folds)."""
    assert _LANES % D == 0, f"head dim {D} must divide {_LANES}"
    m = _LANES // math.gcd(D, _LANES)
    return -(-h // m) * m


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(ix_ref, iy_ref, aw_ref, vt_ref, out_ref, *, h, w, D, P, cdt):
    TR = ix_ref.shape[2]
    N = vt_ref.shape[3]  # h_pad * D
    YG = _LANES // D     # y rows per 128-lane group

    ix = ix_ref[0, 0, :, 0][:, None]                       # [TR, 1] f32
    # NB: Mosaic iota must be integer-typed; cast afterwards
    cols = lax.broadcasted_iota(jnp.int32, (TR, w), 1).astype(jnp.float32)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(ix - cols)).astype(cdt)

    T = jnp.dot(hx, vt_ref[0, 0], preferred_element_type=jnp.float32)

    iy = iy_ref[0, 0, :, 0][:, None]
    aw = aw_ref[0, 0, :, 0][:, None]
    # stage 2: consume T in static 128-lane slices — the y-hat for slice g
    # covers the YG rows y = g*YG..g*YG+YG-1 (lane = y*D + d), built from
    # one 128-wide iota with a static per-slice offset; no full-width
    # [TR, N] hat or product is ever materialized
    ylane0 = (lax.broadcasted_iota(jnp.int32, (TR, _LANES), 1) // D).astype(
        jnp.float32)
    acc = jnp.zeros((TR, _LANES), jnp.float32)
    for g in range(N // _LANES):
        w2_g = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (ylane0 + g * YG)))
        acc = acc + T[:, g * _LANES:(g + 1) * _LANES] * w2_g
    # fold 128 lanes -> D lanes (y-slots within a lane group)
    s = acc[:, :D]
    for c in range(1, YG):
        s = s + acc[:, c * D:(c + 1) * D]
    # attention weight + point sum: [TR, D] -> [TQ, P, D] -> [TQ, D]
    out_ref[0, 0] = (s * aw).reshape(TR // P, P, D).sum(axis=1)


def _level_pallas_fwd(Vt, ix, iy, aw, *, h, w, D, P):
    """Vt: [B,H,w,h_pad*D] (compute dtype); ix/iy/aw: [B,H,R_pad,1] f32.
    Returns [B,H,Q_pad,D] f32."""
    B, H, _, N = Vt.shape
    R_pad = ix.shape[2]
    TR = _row_tile_fwd(P, N)
    assert R_pad % TR == 0  # _level_inputs pads to _row_tile, a multiple
    n_tiles = R_pad // TR
    TQ = TR // P

    kern = functools.partial(_fwd_kernel, h=h, w=w, D=D, P=P, cdt=Vt.dtype)
    return pl.pallas_call(
        kern,
        grid=(B, H, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, TR, 1), lambda b, hh, t: (b, hh, t, 0)),
            pl.BlockSpec((1, 1, TR, 1), lambda b, hh, t: (b, hh, t, 0)),
            pl.BlockSpec((1, 1, TR, 1), lambda b, hh, t: (b, hh, t, 0)),
            pl.BlockSpec((1, 1, w, N), lambda b, hh, t: (b, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, hh, t: (b, hh, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, R_pad // P, D), jnp.float32),
        interpret=_interpret(),
    )(ix, iy, aw, Vt)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_kernel(ix_ref, iy_ref, aw_ref, vt_ref, vtt_ref, g_ref,
                dvt_ref, dix_ref, diy_ref, daw_ref, *, h, w, D, P, cdt):
    TR = ix_ref.shape[2]
    N = vt_ref.shape[3]
    TQ = TR // P
    t = pl.program_id(2)

    ix = ix_ref[0, 0, :, 0][:, None]
    iy = iy_ref[0, 0, :, 0][:, None]
    aw = aw_ref[0, 0, :, 0][:, None]

    cols = lax.broadcasted_iota(jnp.int32, (TR, w), 1).astype(jnp.float32)
    zx = ix - cols
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(zx))                 # [TR, w] f32
    # transposed hat, built directly (no in-kernel transpose)
    colsT = lax.broadcasted_iota(jnp.int32, (w, TR), 0).astype(jnp.float32)
    ixT = ix_ref[0, 0, :, 0][None, :]
    hxT = jnp.maximum(0.0, 1.0 - jnp.abs(ixT - colsT)).astype(cdt)

    ylane = (lax.broadcasted_iota(jnp.int32, (TR, N), 1) // D).astype(
        jnp.float32)
    zy = iy - ylane
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(zy))                 # [TR, N] f32

    # rows' upstream grad: [TQ, D] -> [TR, D] (sublane broadcast over points)
    g = g_ref[0, 0].astype(jnp.float32)                      # [TQ, D]
    g_rows = jnp.broadcast_to(g[:, None, :], (TQ, P, D)).reshape(TR, D)
    # tile along lanes with period D: g_tile[r, y*D+d] = g_rows[r, d]
    g_tile = jnp.concatenate([g_rows] * (N // D), axis=1)    # [TR, N]

    dT = hy * aw * g_tile                                    # [TR, N] f32

    # dVt accumulation across row tiles (output block constant over t)
    contrib = jnp.dot(hxT, dT.astype(cdt),
                      preferred_element_type=jnp.float32)    # [w, N]

    @pl.when(t == 0)
    def _():
        dvt_ref[0, 0] = contrib

    @pl.when(t != 0)
    def _():
        dvt_ref[0, 0] = dvt_ref[0, 0] + contrib

    # dhx = dT @ VtT : [TR, N] @ [N, w]
    dhx = jnp.dot(dT.astype(cdt), vtt_ref[0, 0],
                  preferred_element_type=jnp.float32)        # [TR, w]
    ghx = jnp.where(jnp.abs(zx) < 1.0, -jnp.sign(zx), 0.0)
    dix_ref[0, 0] = jnp.sum(dhx * ghx, axis=1, keepdims=True)

    # recompute T for the weight/iy grads
    T = jnp.dot(hx.astype(cdt), vt_ref[0, 0],
                preferred_element_type=jnp.float32)          # [TR, N]
    Tg = T * g_tile
    daw_ref[0, 0] = jnp.sum(hy * Tg, axis=1, keepdims=True)
    ghy = jnp.where(jnp.abs(zy) < 1.0, -jnp.sign(zy), 0.0)
    diy_ref[0, 0] = jnp.sum(aw * ghy * Tg, axis=1, keepdims=True)


def _level_pallas_bwd(Vt, VtT, ix, iy, aw, g, *, h, w, D, P):
    """g: [B,H,Q_pad,D] f32. Returns (dVt f32, dix, diy, daw [B,H,R_pad,1])."""
    B, H, _, N = Vt.shape
    R_pad = ix.shape[2]
    TR = _row_tile_bwd(P, N)
    assert R_pad % TR == 0  # forward pads to _row_tile, a multiple of this
    n_tiles = R_pad // TR
    TQ = TR // P

    kern = functools.partial(_bwd_kernel, h=h, w=w, D=D, P=P, cdt=Vt.dtype)
    rows_spec = pl.BlockSpec((1, 1, TR, 1), lambda b, hh, t: (b, hh, t, 0))
    return pl.pallas_call(
        kern,
        grid=(B, H, n_tiles),
        in_specs=[
            rows_spec, rows_spec, rows_spec,
            pl.BlockSpec((1, 1, w, N), lambda b, hh, t: (b, hh, 0, 0)),
            pl.BlockSpec((1, 1, N, w), lambda b, hh, t: (b, hh, 0, 0)),
            pl.BlockSpec((1, 1, TQ, D), lambda b, hh, t: (b, hh, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, w, N), lambda b, hh, t: (b, hh, 0, 0)),
            rows_spec, rows_spec, rows_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, w, N), jnp.float32),
            jax.ShapeDtypeStruct((B, H, R_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, R_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, R_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(ix, iy, aw, Vt, VtT, g)


# --------------------------------------------------------------------------
# level data marshalling
# --------------------------------------------------------------------------

def _level_inputs(value_l, loc_l, aw_l, h, w, P):
    """Transpose values x-major (h zero-padded for lane folds) and flatten
    (query, point) rows, padded to a row-tile multiple with aw=0."""
    B, _, H, D = value_l.shape
    Q = loc_l.shape[1]
    hp = _h_pad(h, D)
    Vt = (value_l.reshape(B, h, w, H, D)
          .transpose(0, 3, 2, 1, 4))                       # [B,H,w,h,D]
    if hp != h:
        Vt = jnp.pad(Vt, ((0, 0), (0, 0), (0, 0), (0, hp - h), (0, 0)))
    Vt = Vt.reshape(B, H, w, hp * D)

    ix = loc_l[..., 0].astype(jnp.float32) * w - 0.5       # [B,Q,H,P]
    iy = loc_l[..., 1].astype(jnp.float32) * h - 0.5

    TR = _row_tile(P)
    R = Q * P
    R_pad = -(-R // TR) * TR

    def rows(t):  # [B,Q,H,P] -> [B,H,R_pad,1]
        t = t.transpose(0, 2, 1, 3).reshape(B, H, R)
        if R_pad != R:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, R_pad - R)))
        return t[..., None]

    return Vt, rows(ix), rows(iy), rows(aw_l.astype(jnp.float32)), R_pad


# --------------------------------------------------------------------------
# custom-vjp op
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def msda_pallas(value, spatial_shapes: Sequence[Tuple[int, int]],
                sampling_locations, attention_weights):
    """Fused-TPU multi-scale deformable attention. Same contract as
    ``msda.ms_deform_attn``; exact grid_sample(zeros, align_corners=False)
    semantics."""
    out, _ = _msda_pallas_fwd(value, spatial_shapes, sampling_locations,
                              attention_weights)
    return out


def _msda_pallas_fwd(value, spatial_shapes, sampling_locations,
                     attention_weights):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype

    out = None
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        Vt, ix, iy, aw, _ = _level_inputs(
            value_l, sampling_locations[:, :, :, lid],
            attention_weights[:, :, :, lid], h, w, P)
        o = _level_pallas_fwd(Vt, ix, iy, aw, h=h, w=w, D=D, P=P)
        o = o[:, :, :Q]                                     # drop row padding
        out = o if out is None else out + o
        start += h * w
    out = out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(dtype)
    return out, (value, sampling_locations, attention_weights)


def _msda_pallas_bwd(spatial_shapes, res, g):
    value, sampling_locations, attention_weights = res
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    # [B, Q, H*D] -> [B, H, Q, D] f32
    gq = g.reshape(B, Q, H, D).transpose(0, 2, 1, 3).astype(jnp.float32)

    dval_parts = []
    dloc_parts = []
    daw_parts = []
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        Vt, ix, iy, aw, R_pad = _level_inputs(
            value_l, sampling_locations[:, :, :, lid],
            attention_weights[:, :, :, lid], h, w, P)
        VtT = Vt.swapaxes(2, 3)                            # [B,H,N,w]
        TR = _row_tile(P)
        Qp = R_pad // P
        gq_pad = gq if Qp == Q else jnp.pad(
            gq, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))

        dVt, dix, diy, daw = _level_pallas_bwd(
            Vt, VtT, ix, iy, aw, gq_pad, h=h, w=w, D=D, P=P)

        hp = _h_pad(h, D)
        # [B,H,w,hp*D] -> [B, h*w, H, D]
        dv = (dVt.reshape(B, H, w, hp, D)[:, :, :, :h]
              .transpose(0, 3, 2, 1, 4).reshape(B, h * w, H, D))
        dval_parts.append(dv)

        def unrows(t):  # [B,H,R_pad,1] -> [B,Q,H,P]
            t = t[..., 0][:, :, :Q * P].reshape(B, H, Q, P)
            return t.transpose(0, 2, 1, 3)

        # chain rule through the pixel-coordinate maps (ix = x*w - 0.5)
        dloc = jnp.stack([unrows(dix) * w, unrows(diy) * h], axis=-1)
        dloc_parts.append(dloc)
        daw_parts.append(unrows(daw))
        start += h * w

    dvalue = jnp.concatenate(dval_parts, axis=1).astype(value.dtype)
    dloc = jnp.stack(dloc_parts, axis=3).astype(sampling_locations.dtype)
    daw = jnp.stack(daw_parts, axis=3).astype(attention_weights.dtype)
    return dvalue, dloc, daw


msda_pallas.defvjp(_msda_pallas_fwd, _msda_pallas_bwd)
