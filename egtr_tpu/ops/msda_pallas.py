"""Fused Pallas TPU kernel for multi-scale deformable attention.

Same separable-hat math as ``msda._msda_matmul`` (see that module's
docstring; reference semantics: model/custom_kernel/cuda/
ms_deform_im2col_cuda.cuh:237-299), but stage 2 consumes stage 1's MXU tile
directly in VMEM, so the [rows, h*D] intermediate never touches HBM. A
custom VJP recomputes the hat vectors in the backward pass from the raw
(value, locations, weights) residuals — training memory is O(inputs); the
reference CUDA kernel achieves the same by re-deriving bilinear weights in
col2im (ms_deform_im2col_cuda.cuh:324-434).

Layout: queries live on the LANE axis. Sampling rows are shipped as
[B, H, P, Q_pad] (query minor) and values as ``VtT [B, H, h*D, w]`` so
every kernel operand has a wide, dense minor dimension. The previous
row-on-sublane layout ([B, H, Q*P, 1]) forced XLA to relayout each operand
into a 128x lane-padded form before every pallas call — 72 layout copies
~ 30 ms/image at 600x1000, measured — and required padding h so h*D hit a
lane multiple. With q on lanes both problems vanish: no relayout copies,
and h*D only needs the free sublane granularity.

Kernel per level (static spatial shape (h, w), head dim D, N = h*D):

  grid = (B, H, q_tiles); each step covers TQ queries x all P points.

  forward step (loop over p):
    hxT = relu(1 - |ix_p - iota_rows|)          [w, TQ]   (VPU, analytic)
    T_p = VtT @ hxT                             [N, TQ]   (MXU)
    hy  = relu(1 - |iy_p - sublane//D|)         [N, TQ]   (VPU)
    acc += T_p * hy * aw_p
  out = acc.reshape(h, D, TQ).sum(0)            [D, TQ]   (sublane fold)

  backward step (3 MXU dots per point; NT/TN contractions are native):
    dT    = hy * aw_p * tile(g)                 [N, TQ]
    dVtT += dT @ hxT^T                          (NT dot)
    dhxT  = VtT^T @ dT                          (TN dot)
    dix   = sum_n dhxT * d(hxT)/d(ix)           (sublane reduce)
    T     = VtT @ hxT (recomputed); daw/diy are sublane reduces of T*g.

All in-kernel ops are iota/compare/multiply/static-slice/dot — no dynamic
indexing, which Mosaic cannot lower on TPU (measured round 1).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda_window import (band_starts, band_stride, fit_tile, query_tile,
                          segment_bounds, segment_cols, segment_rows_t,
                          unsegment_cols, unsegment_rows, window_rows)

# Set True to run kernels through the Pallas interpreter (CPU testing).
INTERPRET = False

_LANES = 128


def _interpret() -> bool:
    return INTERPRET or jax.default_backend() == "cpu"


def _tq_fwd(N: int) -> int:
    # forward keeps ~3 live [N, TQ] f32 temporaries (acc, T_p, hy)
    return fit_tile(N, 3)


# NEGATIVE RESULT (round 4, measured): batching all P points into ONE
# stage-1 MXU dot per (level, tile) — rows pre-packed [B,H,T,1,P*TQ], one
# [N, w] @ [w, P*TQ] dot — is ~2x SLOWER on device than the p-loop of 4
# dots (encoder-scale probe: 39.3 vs 33.3 ms/call incl. the ~27 ms tunnel
# fetch, i.e. ~12 vs ~6 ms device). The hypothesis was amortizing the
# systolic weight-load fill across 4x the lanes; in practice the VMEM
# pressure of the [N, P*TQ] f32 intermediates forces the minimum TQ=128
# tile (4x the grid steps) and the strided [h, D, P, TQ] fold reduces
# worse than the p-loop's in-place accumulate. Kept behind
# EGTR_MSDA_BATCH_P=1 for re-probing; oracle tests cover both variants.
import os as _os

FWD_BATCH_P = _os.environ.get("EGTR_MSDA_BATCH_P", "0") == "1"


def _tq_fwd_bp(N: int, P: int) -> int:
    # batched-P forward: the live [N, P*TQ] f32 temporaries (T, the
    # hy*aw product before the P-fold, the f32 hat) scale with P
    return fit_tile(N * P, 3)


def _tq_bwd(N: int) -> int:
    # backward keeps ~8 live [N, TQ] f32 temporaries
    # (g_tile, ysub, hy, dT, T, Tg, dvtt acc, fusion slack)
    return fit_tile(N, 8)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_body(ix_ref, iy_ref, aw_ref, vtt, out_ref, h, w, D, P, cdt):
    """vtt: [N, w] array (N = h*D; h is the band height on the windowed
    path, the full level height otherwise — iy is band-local there).

    When ``vtt`` is int8 (opt-in ``msda_int8``), the hat vector is
    rounded to 7 bits and the stage-1 dot runs in the MXU's int8 mode
    (2x bf16 throughput on v5e); the caller pre-folds the value scale
    and the 1/127 hat scale into the attention-weight rows."""
    N = vtt.shape[0]
    TQ = ix_ref.shape[3]
    quant = vtt.dtype == jnp.int8

    xsub = lax.broadcasted_iota(jnp.int32, (w, TQ), 0).astype(jnp.float32)
    ysub = lax.broadcasted_iota(jnp.int32, (h, TQ), 0).astype(jnp.float32)

    # The kernel is VPU-bound (stage-1 MACs/element = w/MXU-rate ~ the
    # 6+ VPU ops/element of the naive hy build + triple multiply), so
    # the y-hat and its attention-weight product are built at [h, TQ]
    # and broadcast across the D sublanes of the reshaped [h, D, TQ]
    # accumulator — ~3x fewer [N, TQ]-sized VPU ops per point.
    acc = jnp.zeros((h, D, TQ), jnp.float32)
    for p in range(P):
        ixp = ix_ref[0, 0, p, :][None, :]                  # [1, TQ]
        iyp = iy_ref[0, 0, p, :][None, :]
        awp = aw_ref[0, 0, p, :][None, :]
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(ixp - xsub))   # [w, TQ]
        if quant:
            hxq = jnp.round(hx * 127.0).astype(jnp.int8)
            Tp = jnp.dot(vtt, hxq,
                         preferred_element_type=jnp.int32
                         ).astype(jnp.float32)             # [N, TQ]
        else:
            Tp = jnp.dot(vtt, hx.astype(cdt),
                         preferred_element_type=jnp.float32)
        hyw = jnp.maximum(0.0, 1.0 - jnp.abs(iyp - ysub)) * awp   # [h, TQ]
        acc = acc + Tp.reshape(h, D, TQ) * hyw[:, None, :]
    # fold y: [h, D, TQ] -> [D, TQ]
    out_ref[0, 0] = acc.sum(axis=0)


def _fwd_kernel(ix_ref, iy_ref, aw_ref, vtt_ref, out_ref, *, h, w, D, P, cdt):
    _fwd_body(ix_ref, iy_ref, aw_ref, vtt_ref[0, 0], out_ref, h, w, D, P, cdt)


def _fwd_body_bp(ix_ref, iy_ref, aw_ref, vtt, out_ref, h, w, D, P, cdt):
    """Batched-P forward body: rows arrive pre-flattened [1,1,1,P*TQ]
    (P major, TQ minor — see ``_pt_rows``), stage 1 is ONE
    [N, w] @ [w, P*TQ] dot, and the P-point fold happens in the same
    reshape-reduce that folds y. Numerically identical to the p-loop
    body (same dots, same f32 accumulation order per point)."""
    N = vtt.shape[0]
    PT = ix_ref.shape[4]
    TQ = PT // P
    quant = vtt.dtype == jnp.int8

    ixall = ix_ref[0, 0, 0, 0, :][None, :]                 # [1, P*TQ]
    iyall = iy_ref[0, 0, 0, 0, :][None, :]
    awall = aw_ref[0, 0, 0, 0, :][None, :]

    xsub = lax.broadcasted_iota(jnp.int32, (w, PT), 0).astype(jnp.float32)
    ysub = lax.broadcasted_iota(jnp.int32, (h, PT), 0).astype(jnp.float32)

    hx = jnp.maximum(0.0, 1.0 - jnp.abs(ixall - xsub))     # [w, P*TQ]
    if quant:
        hxq = jnp.round(hx * 127.0).astype(jnp.int8)
        T = jnp.dot(vtt, hxq, preferred_element_type=jnp.int32
                    ).astype(jnp.float32)                  # [N, P*TQ]
    else:
        T = jnp.dot(vtt, hx.astype(cdt),
                    preferred_element_type=jnp.float32)
    hyw = jnp.maximum(0.0, 1.0 - jnp.abs(iyall - ysub)) * awall  # [h, P*TQ]
    acc = T.reshape(h, D, P, TQ) * hyw.reshape(h, 1, P, TQ)
    # fold y and the point axis together: [h, D, P, TQ] -> [D, TQ]
    out_ref[0, 0] = acc.sum(axis=(0, 2))


def _fwd_kernel_bp(ix_ref, iy_ref, aw_ref, vtt_ref, out_ref, *,
                   h, w, D, P, cdt):
    _fwd_body_bp(ix_ref, iy_ref, aw_ref, vtt_ref[0, 0], out_ref,
                 h, w, D, P, cdt)


def _pt_rows(t, TQ: int):
    """[B, H, P, Q_pad] -> [B, H, T, 1, P*TQ]: each tile's P rows packed
    contiguously on lanes (P major, TQ minor), so the kernel's single
    stage-1 dot covers all P points. Pure XLA relayout, fused into the
    marshalling transposes. The singleton axis satisfies Mosaic's
    block-shape rule (second-to-last block dim must equal the array dim
    or be a multiple of 8 — the per-tile block covers exactly one tile)."""
    B, H, P, Qp = t.shape
    T = Qp // TQ
    return (t.reshape(B, H, P, T, TQ).transpose(0, 1, 3, 2, 4)
            .reshape(B, H, T, 1, P * TQ))


def _fwd_body_hb(ix_ref, iy_ref, aw_ref, vt, vb, out_ref, hb, w, D, P, cdt):
    """Banded forward body over a band split into its two half-band
    blocks ``vt``/``vb`` (each [hb*D, w]; band height win = 2*hb). Same
    math as ``_fwd_body`` on the concatenated band — the stage-1 dot
    splits over its non-contracted N axis, so the two half dots are
    bit-identical to the single band dot and nothing is concatenated in
    VMEM. iy is band-local ([0, 2*hb))."""
    TQ = ix_ref.shape[3]
    quant = vt.dtype == jnp.int8

    xsub = lax.broadcasted_iota(jnp.int32, (w, TQ), 0).astype(jnp.float32)
    # per-half-band iotas instead of slicing one [2hb, TQ] hat array:
    # for win=8 the half-band is 4 sublanes and Mosaic cannot lower the
    # sub-8-row slice (it falls back to a gather and rejects it)
    ysub_t = lax.broadcasted_iota(jnp.int32, (hb, TQ), 0).astype(jnp.float32)
    ysub_b = ysub_t + float(hb)

    acc_t = jnp.zeros((hb, D, TQ), jnp.float32)
    acc_b = jnp.zeros((hb, D, TQ), jnp.float32)
    for p in range(P):
        ixp = ix_ref[0, 0, p, :][None, :]                  # [1, TQ]
        iyp = iy_ref[0, 0, p, :][None, :]
        awp = aw_ref[0, 0, p, :][None, :]
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(ixp - xsub))   # [w, TQ]
        if quant:
            hxc = jnp.round(hx * 127.0).astype(jnp.int8)
            Tt = jnp.dot(vt, hxc, preferred_element_type=jnp.int32
                         ).astype(jnp.float32)             # [hb*D, TQ]
            Tb = jnp.dot(vb, hxc, preferred_element_type=jnp.int32
                         ).astype(jnp.float32)
        else:
            hxc = hx.astype(cdt)
            Tt = jnp.dot(vt, hxc, preferred_element_type=jnp.float32)
            Tb = jnp.dot(vb, hxc, preferred_element_type=jnp.float32)
        hyw_t = jnp.maximum(0.0, 1.0 - jnp.abs(iyp - ysub_t)) * awp  # [hb,TQ]
        hyw_b = jnp.maximum(0.0, 1.0 - jnp.abs(iyp - ysub_b)) * awp
        acc_t = acc_t + Tt.reshape(hb, D, TQ) * hyw_t[:, None, :]
        acc_b = acc_b + Tb.reshape(hb, D, TQ) * hyw_b[:, None, :]
    out_ref[0, 0] = acc_t.sum(axis=0) + acc_b.sum(axis=0)


def _fwd_kernel_win(bidx_ref, ix_ref, iy_ref, aw_ref, vt_ref, vb_ref,
                    out_ref, *, win, w, D, P, cdt):
    # bidx_ref (scalar prefetch) is consumed by the index_maps only: it
    # selects which two half-band blocks vt/vb hold; iy is band-local.
    del bidx_ref
    _fwd_body_hb(ix_ref, iy_ref, aw_ref, vt_ref[0, 0, 0], vb_ref[0, 0, 0],
                 out_ref, win // 2, w, D, P, cdt)


def _fwd_kernel_win_pp(bidx_ref, ix_ref, iy_ref, aw_ref, *refs,
                       win, w, D, P, cdt):
    """Per-point banded forward (band="point"): each point p reads its
    OWN half-band block pair (refs[2p], refs[2p+1]), selected by
    bidx[b,hh,p,t] in the index_maps; iy is band-local per point. Unlike
    the per-tile body, the y-fold runs per point (each point's [hb,D,TQ]
    accumulator lives in a different band, so they cannot share one)."""
    del bidx_ref
    vrefs, out_ref = refs[:-1], refs[-1]
    hb = win // 2
    TQ = ix_ref.shape[3]
    quant = vrefs[0].dtype == jnp.int8

    xsub = lax.broadcasted_iota(jnp.int32, (w, TQ), 0).astype(jnp.float32)
    # two half-band iotas, not a [2hb, TQ] slice — see _fwd_body_hb
    ysub_t = lax.broadcasted_iota(jnp.int32, (hb, TQ), 0).astype(jnp.float32)
    ysub_b = ysub_t + float(hb)

    out = jnp.zeros((D, TQ), jnp.float32)
    for p in range(P):
        vt = vrefs[2 * p][0, 0, 0]
        vb = vrefs[2 * p + 1][0, 0, 0]
        ixp = ix_ref[0, 0, p, :][None, :]                  # [1, TQ]
        iyp = iy_ref[0, 0, p, :][None, :]
        awp = aw_ref[0, 0, p, :][None, :]
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(ixp - xsub))   # [w, TQ]
        if quant:
            hxc = jnp.round(hx * 127.0).astype(jnp.int8)
            Tt = jnp.dot(vt, hxc, preferred_element_type=jnp.int32
                         ).astype(jnp.float32)             # [hb*D, TQ]
            Tb = jnp.dot(vb, hxc, preferred_element_type=jnp.int32
                         ).astype(jnp.float32)
        else:
            hxc = hx.astype(cdt)
            Tt = jnp.dot(vt, hxc, preferred_element_type=jnp.float32)
            Tb = jnp.dot(vb, hxc, preferred_element_type=jnp.float32)
        hyw_t = jnp.maximum(0.0, 1.0 - jnp.abs(iyp - ysub_t)) * awp  # [hb,TQ]
        hyw_b = jnp.maximum(0.0, 1.0 - jnp.abs(iyp - ysub_b)) * awp
        out = out + ((Tt.reshape(hb, D, TQ) * hyw_t[:, None, :]).sum(0)
                     + (Tb.reshape(hb, D, TQ) * hyw_b[:, None, :]).sum(0))
    out_ref[0, 0] = out


def _pp_value_specs(P: int, Nh: int, w: int):
    """2P half-band BlockSpecs: point p's band j = blocks (j, j+1), with
    j = bidx[b, hh, p, t] (bidx [B,H,P,T] scalar prefetch)."""
    specs = []
    for p in range(P):
        specs.append(pl.BlockSpec(
            (1, 1, 1, Nh, w),
            lambda b, hh, t, bref, p=p: (b, hh, bref[b, hh, p, t], 0, 0)))
        specs.append(pl.BlockSpec(
            (1, 1, 1, Nh, w),
            lambda b, hh, t, bref, p=p: (b, hh, bref[b, hh, p, t] + 1, 0, 0)))
    return specs


def _level_pallas_fwd(VtT, ix, iy, aw, *, h, w, D, P, batch_p=None):
    """VtT: [B,H,h*D,w] (compute dtype); ix/iy/aw: [B,H,P,Q_pad] f32.
    Returns [B,H,D,Q_pad] f32."""
    B, H, N, _ = VtT.shape
    Q_pad = ix.shape[3]
    if batch_p is None:
        batch_p = FWD_BATCH_P

    if batch_p:
        TQ = _tq_fwd_bp(N, P)
        # callers pad to _tq_fwd(N) multiples; the batched tile is always
        # <= that and both are 128*2^k, so it divides the padding
        assert Q_pad % TQ == 0
        n_tiles = Q_pad // TQ
        kern = functools.partial(_fwd_kernel_bp, h=h, w=w, D=D, P=P,
                                 cdt=VtT.dtype)
        rows_spec = pl.BlockSpec((1, 1, 1, 1, P * TQ),
                                 lambda b, hh, t: (b, hh, t, 0, 0))
        return pl.pallas_call(
            kern,
            grid=(B, H, n_tiles),
            in_specs=[
                rows_spec, rows_spec, rows_spec,
                pl.BlockSpec((1, 1, N, w), lambda b, hh, t: (b, hh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, D, TQ),
                                   lambda b, hh, t: (b, hh, 0, t)),
            out_shape=jax.ShapeDtypeStruct((B, H, D, Q_pad), jnp.float32),
            interpret=_interpret(),
        )(_pt_rows(ix, TQ), _pt_rows(iy, TQ), _pt_rows(aw, TQ), VtT)

    TQ = _tq_fwd(N)
    assert Q_pad % TQ == 0  # _level_inputs pads to the tile returned here
    n_tiles = Q_pad // TQ

    kern = functools.partial(_fwd_kernel, h=h, w=w, D=D, P=P, cdt=VtT.dtype)
    rows_spec = pl.BlockSpec((1, 1, P, TQ), lambda b, hh, t: (b, hh, 0, t))
    return pl.pallas_call(
        kern,
        grid=(B, H, n_tiles),
        in_specs=[
            rows_spec, rows_spec, rows_spec,
            pl.BlockSpec((1, 1, N, w), lambda b, hh, t: (b, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, D, TQ), lambda b, hh, t: (b, hh, 0, t)),
        out_shape=jax.ShapeDtypeStruct((B, H, D, Q_pad), jnp.float32),
        interpret=_interpret(),
    )(ix, iy, aw, VtT)


def _half_band_blocks(VtT, h: int, D: int, win: int):
    """[B,H,h*D,w] -> [B,H,n_half,(win/2)*D,w] non-overlapping half-band
    blocks: band j (start j*win/2, ``band_starts`` geometry) is exactly
    blocks (j, j+1). The row split is a PURE reshape — the only copy is
    the zero-pad of the overhang rows below h, which XLA fuses into the
    ``_vtt`` marshalling transpose. Replaces a materialized overlapping
    band stack (~2x the values in HBM per call)."""
    B, H, N, w = VtT.shape
    hb = band_stride(win)
    assert win == 2 * hb, "banded kernels require an even window"
    hgeo = band_starts(h, win)[-1] + win
    if hgeo > h:
        VtT = jnp.pad(VtT, ((0, 0), (0, 0), (0, (hgeo - h) * D), (0, 0)))
    return VtT.reshape(B, H, hgeo // hb, hb * D, w)


def _level_pallas_fwd_win(Vh, bidx, ix, iy, aw, *, win, w, D, P):
    """Banded forward. Vh: [B,H,n_half,(win/2)*D,w] half-band blocks;
    bidx: [B,H,T] i32 (band="tile") or [B,H,P,T] (band="point") scalar
    prefetch; band j = half-band blocks j and j+1, selected as Blocked
    refs over the same array; ix/iy/aw: [B,H,P,Q_pad] f32 with iy
    band-local (per point when bidx is 4-D). Returns [B,H,D,Q_pad] f32."""
    B, H, _, Nh, _ = Vh.shape
    N = 2 * Nh
    Q_pad = ix.shape[3]
    # the tile is read off bidx: the caller chose TQ (query_tile — the
    # VMEM-fit tile capped by the band's raster-row budget)
    n_tiles = bidx.shape[-1]
    assert Q_pad % n_tiles == 0
    TQ = Q_pad // n_tiles
    assert TQ % _LANES == 0 and TQ <= _tq_fwd(N)

    if bidx.ndim == 4:                                     # band="point"
        assert bidx.shape == (B, H, P, n_tiles)
        kern = functools.partial(_fwd_kernel_win_pp, win=win, w=w, D=D,
                                 P=P, cdt=Vh.dtype)
        rows_spec = pl.BlockSpec((1, 1, P, TQ),
                                 lambda b, hh, t, bref: (b, hh, 0, t))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_tiles),
            in_specs=[rows_spec, rows_spec, rows_spec,
                      *_pp_value_specs(P, Nh, w)],
            out_specs=pl.BlockSpec((1, 1, D, TQ),
                                   lambda b, hh, t, bref: (b, hh, 0, t)),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, H, D, Q_pad), jnp.float32),
            interpret=_interpret(),
        )(bidx, ix, iy, aw, *([Vh] * (2 * P)))

    assert bidx.shape == (B, H, n_tiles)
    kern = functools.partial(_fwd_kernel_win, win=win, w=w, D=D, P=P,
                             cdt=Vh.dtype)
    rows_spec = pl.BlockSpec((1, 1, P, TQ),
                             lambda b, hh, t, bref: (b, hh, 0, t))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, n_tiles),
        in_specs=[
            rows_spec, rows_spec, rows_spec,
            pl.BlockSpec((1, 1, 1, Nh, w),
                         lambda b, hh, t, bref: (b, hh, bref[b, hh, t], 0, 0)),
            pl.BlockSpec((1, 1, 1, Nh, w),
                         lambda b, hh, t, bref:
                         (b, hh, bref[b, hh, t] + 1, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, D, TQ),
                               lambda b, hh, t, bref: (b, hh, 0, t)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D, Q_pad), jnp.float32),
        interpret=_interpret(),
    )(bidx, ix, iy, aw, Vh, Vh)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_rows_body(ix_ref, iy_ref, aw_ref, vtt, g_ref,
                   dix_ref, diy_ref, daw_ref, h, w, D, P, cdt):
    """vtt: [N, w] array (N = h*D; h is the band height on the windowed
    path — iy is band-local there, and the hat support of clamped
    coordinates never leaves the band, so banded row grads are exactly
    the full-height row grads)."""
    N = vtt.shape[0]
    TQ = ix_ref.shape[3]

    xsub = lax.broadcasted_iota(jnp.int32, (w, TQ), 0).astype(jnp.float32)
    ysub = (lax.broadcasted_iota(jnp.int32, (N, TQ), 0) // D).astype(
        jnp.float32)

    g = g_ref[0, 0].astype(jnp.float32)                    # [D, TQ]
    g_tile = jnp.broadcast_to(g[None], (h, D, TQ)).reshape(N, TQ)

    for p in range(P):
        ixp = ix_ref[0, 0, p, :][None, :]
        iyp = iy_ref[0, 0, p, :][None, :]
        awp = aw_ref[0, 0, p, :][None, :]

        zx = ixp - xsub                                    # [w, TQ]
        hxT = jnp.maximum(0.0, 1.0 - jnp.abs(zx))
        zy = iyp - ysub                                    # [N, TQ]
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(zy))

        dT = hy * awp * g_tile                             # [N, TQ] f32

        # dhxT = VtT^T @ dT  (contract the N sublanes of both — TN)
        dhxT = lax.dot_general(
            vtt, dT.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [w, TQ]
        ghx = jnp.where(jnp.abs(zx) < 1.0, -jnp.sign(zx), 0.0)
        dix_ref[0, 0, pl.ds(p, 1), :] = jnp.sum(
            dhxT * ghx, axis=0, keepdims=True)

        # recompute T for the weight/iy grads
        T = jnp.dot(vtt, hxT.astype(cdt),
                    preferred_element_type=jnp.float32)    # [N, TQ]
        Tg = T * g_tile
        daw_ref[0, 0, pl.ds(p, 1), :] = jnp.sum(
            hy * Tg, axis=0, keepdims=True)
        ghy = jnp.where(jnp.abs(zy) < 1.0, -jnp.sign(zy), 0.0)
        diy_ref[0, 0, pl.ds(p, 1), :] = jnp.sum(
            awp * ghy * Tg, axis=0, keepdims=True)


def _bwd_rows_kernel(ix_ref, iy_ref, aw_ref, vtt_ref, g_ref,
                     dix_ref, diy_ref, daw_ref, *, h, w, D, P, cdt):
    _bwd_rows_body(ix_ref, iy_ref, aw_ref, vtt_ref[0, 0], g_ref,
                   dix_ref, diy_ref, daw_ref, h, w, D, P, cdt)


def _bwd_rows_body_hb(ix_ref, iy_ref, aw_ref, vsel, g_ref,
                      dix_ref, diy_ref, daw_ref, hb, w, D, P, cdt):
    """Banded row grads over a band split into its two half-band blocks
    (see ``_fwd_body_hb``): every [N, TQ] product/reduce of
    ``_bwd_rows_body`` splits over the band's y rows, and dhxT is the
    sum of the two half TN contractions — bit-identical to the single
    band-block math.

    ``vsel(p) -> (vt, vb)`` supplies point p's half-band blocks — the
    same pair for every p under band="tile", point p's own pair under
    band="point" (the per-p math below is already band-local and writes
    per-p outputs, so the two modes share this body verbatim)."""
    TQ = ix_ref.shape[3]

    Nh = hb * D
    xsub = lax.broadcasted_iota(jnp.int32, (w, TQ), 0).astype(jnp.float32)
    yt = (lax.broadcasted_iota(jnp.int32, (Nh, TQ), 0) // D).astype(
        jnp.float32)
    yb = yt + float(hb)

    g = g_ref[0, 0].astype(jnp.float32)                    # [D, TQ]
    g_tile = jnp.broadcast_to(g[None], (hb, D, TQ)).reshape(Nh, TQ)

    for p in range(P):
        vt, vb = vsel(p)
        ixp = ix_ref[0, 0, p, :][None, :]
        iyp = iy_ref[0, 0, p, :][None, :]
        awp = aw_ref[0, 0, p, :][None, :]

        zx = ixp - xsub                                    # [w, TQ]
        hxT = jnp.maximum(0.0, 1.0 - jnp.abs(zx))
        zyt = iyp - yt                                     # [Nh, TQ]
        hyt = jnp.maximum(0.0, 1.0 - jnp.abs(zyt))
        zyb = iyp - yb
        hyb = jnp.maximum(0.0, 1.0 - jnp.abs(zyb))

        dTt = hyt * awp * g_tile                           # [Nh, TQ] f32
        dTb = hyb * awp * g_tile

        dhxT = lax.dot_general(
            vt, dTt.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + lax.dot_general(
            vb, dTb.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [w, TQ]
        ghx = jnp.where(jnp.abs(zx) < 1.0, -jnp.sign(zx), 0.0)
        dix_ref[0, 0, pl.ds(p, 1), :] = jnp.sum(
            dhxT * ghx, axis=0, keepdims=True)

        hxc = hxT.astype(cdt)
        Tgt = jnp.dot(vt, hxc,
                      preferred_element_type=jnp.float32) * g_tile
        Tgb = jnp.dot(vb, hxc,
                      preferred_element_type=jnp.float32) * g_tile
        daw_ref[0, 0, pl.ds(p, 1), :] = (
            jnp.sum(hyt * Tgt, axis=0, keepdims=True)
            + jnp.sum(hyb * Tgb, axis=0, keepdims=True))
        ghyt = jnp.where(jnp.abs(zyt) < 1.0, -jnp.sign(zyt), 0.0)
        ghyb = jnp.where(jnp.abs(zyb) < 1.0, -jnp.sign(zyb), 0.0)
        diy_ref[0, 0, pl.ds(p, 1), :] = (
            jnp.sum(awp * ghyt * Tgt, axis=0, keepdims=True)
            + jnp.sum(awp * ghyb * Tgb, axis=0, keepdims=True))


def _bwd_rows_kernel_win(bidx_ref, ix_ref, iy_ref, aw_ref, vt_ref, vb_ref,
                         g_ref, dix_ref, diy_ref, daw_ref, *,
                         win, w, D, P, cdt):
    # bidx_ref (scalar prefetch) is consumed by the index_maps only
    del bidx_ref
    _bwd_rows_body_hb(ix_ref, iy_ref, aw_ref,
                      lambda p: (vt_ref[0, 0, 0], vb_ref[0, 0, 0]),
                      g_ref, dix_ref, diy_ref, daw_ref,
                      win // 2, w, D, P, cdt)


def _bwd_rows_kernel_win_pp(bidx_ref, ix_ref, iy_ref, aw_ref, *refs,
                            win, w, D, P, cdt):
    """Per-point banded row grads: point p's half-band pair is
    (refs[2p], refs[2p+1]), selected by bidx[b,hh,p,t]."""
    del bidx_ref
    vrefs = refs[:2 * P]
    g_ref, dix_ref, diy_ref, daw_ref = refs[2 * P:]
    _bwd_rows_body_hb(ix_ref, iy_ref, aw_ref,
                      lambda p: (vrefs[2 * p][0, 0, 0],
                                 vrefs[2 * p + 1][0, 0, 0]),
                      g_ref, dix_ref, diy_ref, daw_ref,
                      win // 2, w, D, P, cdt)


def _bwd_dvtt_body(ix_ref, iy_ref, aw_ref, g_ref, N, h, w, D, P, cdt):
    """One tile's value-gradient contribution [N, w] (N = h*D; h is the
    band height on the windowed path — iy is band-local there)."""
    TQ = ix_ref.shape[3]

    xsub = lax.broadcasted_iota(jnp.int32, (w, TQ), 0).astype(jnp.float32)
    ysub = (lax.broadcasted_iota(jnp.int32, (N, TQ), 0) // D).astype(
        jnp.float32)

    g = g_ref[0, 0].astype(jnp.float32)                    # [D, TQ]
    g_tile = jnp.broadcast_to(g[None], (h, D, TQ)).reshape(N, TQ)

    dvtt = jnp.zeros((N, w), jnp.float32)
    for p in range(P):
        ixp = ix_ref[0, 0, p, :][None, :]
        iyp = iy_ref[0, 0, p, :][None, :]
        awp = aw_ref[0, 0, p, :][None, :]
        hxT = jnp.maximum(0.0, 1.0 - jnp.abs(ixp - xsub))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(iyp - ysub))
        dT = hy * awp * g_tile                             # [N, TQ] f32
        # dVtT += dT @ hxT^T  (contract the query lanes of both — NT)
        dvtt = dvtt + lax.dot_general(
            dT.astype(cdt), hxT.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [N, w]
    return dvtt


def _bwd_dvtt_kernel(ix_ref, iy_ref, aw_ref, g_ref, dvtt_ref, *,
                     h, w, D, P, cdt):
    N = dvtt_ref.shape[2]
    t = pl.program_id(2)
    dvtt = _bwd_dvtt_body(ix_ref, iy_ref, aw_ref, g_ref, N, h, w, D, P, cdt)

    @pl.when(t == 0)
    def _():
        dvtt_ref[0, 0] = dvtt

    @pl.when(t != 0)
    def _():
        dvtt_ref[0, 0] = dvtt_ref[0, 0] + dvtt


def _bwd_dvtt_kernel_win(bidx_ref, perm_ref, first_ref,
                         ix_ref, iy_ref, aw_ref, g_ref, dvb_ref, *,
                         win, w, D, P, cdt):
    """Banded value grads. Grid (B, H, T) runs tiles in band-sorted
    order (perm prefetch), so all tiles accumulating into one band
    block are consecutive; ``first`` marks the first tile of each band
    run (init vs accumulate). Bands never selected by any tile are
    masked to zero by the caller."""
    del bidx_ref
    b, hh, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    N = dvb_ref.shape[3]
    dvtt = _bwd_dvtt_body(ix_ref, iy_ref, aw_ref, g_ref, N, win, w, D, P,
                          cdt)

    first = first_ref[b, hh, t] != 0

    @pl.when(first)
    def _():
        dvb_ref[0, 0, 0] = dvtt

    @pl.when(jnp.logical_not(first))
    def _():
        dvb_ref[0, 0, 0] = dvb_ref[0, 0, 0] + dvtt


def _bwd_dvtt_kernel_win_pp(bsort_ref, pidx_ref, tidx_ref, first_ref,
                            ix_ref, iy_ref, aw_ref, g_ref, dvb_ref, *,
                            win, w, D, cdt):
    """Per-point banded value grads. The grid's third axis enumerates
    (point, tile) pairs in band-sorted order: step s processes point
    pidx[s] of tile tidx[s] (its rows arrive point-sliced through a
    5-D [B,H,P,1,Q_pad] layout — the singleton keeps the point axis out
    of the block's last two dims, which Mosaic requires to be 8/128
    multiples or full) and accumulates into band block bsort[s];
    ``first`` marks the first pair of each band run (init vs
    accumulate). Inline P=1 version of ``_bwd_dvtt_body``: same dots,
    same accumulation order."""
    del bsort_ref, pidx_ref, tidx_ref
    b, hh, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    N = dvb_ref.shape[3]
    TQ = ix_ref.shape[4]

    xsub = lax.broadcasted_iota(jnp.int32, (w, TQ), 0).astype(jnp.float32)
    ysub = (lax.broadcasted_iota(jnp.int32, (N, TQ), 0) // D).astype(
        jnp.float32)

    g = g_ref[0, 0].astype(jnp.float32)                    # [D, TQ]
    g_tile = jnp.broadcast_to(g[None], (win, D, TQ)).reshape(N, TQ)

    ixp = ix_ref[0, 0, 0, 0, :][None, :]                   # [1, TQ]
    iyp = iy_ref[0, 0, 0, 0, :][None, :]
    awp = aw_ref[0, 0, 0, 0, :][None, :]
    hxT = jnp.maximum(0.0, 1.0 - jnp.abs(ixp - xsub))      # [w, TQ]
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(iyp - ysub))       # [N, TQ]
    dT = hy * awp * g_tile
    dvtt = lax.dot_general(
        dT.astype(cdt), hxT.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [N, w]

    first = first_ref[b, hh, s] != 0

    @pl.when(first)
    def _():
        dvb_ref[0, 0, 0] = dvtt

    @pl.when(jnp.logical_not(first))
    def _():
        dvb_ref[0, 0, 0] = dvb_ref[0, 0, 0] + dvtt


def _level_pallas_bwd_win_pp(Vh, bidx, ix, iyb, aw, g, *, win, w, D, P):
    """Per-point (band="point") banded backward: same contract as
    ``_level_pallas_bwd_win`` but bidx is [B,H,P,T] and every kernel
    selects point p's own half-band pair. The value-grad accumulation
    sorts the flattened (point, tile) pairs by band — P*T grid steps of
    single-point tiles instead of T steps of P-loops (same total MACs)."""
    B, H, n_half, Nh, _ = Vh.shape
    N = 2 * Nh
    nb = n_half - 1
    Q_pad = ix.shape[3]
    n_tiles = bidx.shape[3]
    assert Q_pad % n_tiles == 0 and bidx.shape == (B, H, P, n_tiles)
    TQ = Q_pad // n_tiles
    assert TQ % _LANES == 0

    rows_spec = pl.BlockSpec((1, 1, P, TQ),
                             lambda b, hh, t, *refs: (b, hh, 0, t))
    g_spec = pl.BlockSpec((1, 1, D, TQ),
                          lambda b, hh, t, *refs: (b, hh, 0, t))

    kern_r = functools.partial(_bwd_rows_kernel_win_pp, win=win, w=w, D=D,
                               P=P, cdt=Vh.dtype)
    grid_r = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, n_tiles),
        in_specs=[rows_spec, rows_spec, rows_spec,
                  *_pp_value_specs(P, Nh, w), g_spec],
        out_specs=[rows_spec, rows_spec, rows_spec],
    )
    dix, diy, daw = pl.pallas_call(
        kern_r,
        grid_spec=grid_r,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(bidx, ix, iyb, aw, *([Vh] * (2 * P)), g)

    # flatten (point, tile) p-major and sort by band: accumulation into
    # each band block runs over consecutive grid steps
    S = P * n_tiles
    bflat = bidx.reshape(B, H, S)
    perm = jnp.argsort(bflat, axis=2, stable=True).astype(jnp.int32)
    bsort = jnp.take_along_axis(bflat, perm, axis=2)
    pidx = perm // n_tiles
    tidx = perm % n_tiles
    first = jnp.concatenate(
        [jnp.ones_like(bsort[:, :, :1]),
         (bsort[:, :, 1:] != bsort[:, :, :-1]).astype(jnp.int32)], axis=2)

    def prow():
        # point-sliced rows: block (1,1,1,1,TQ) at (b, hh, pidx[s], 0,
        # tidx[s]) over a 5-D [B,H,P,1,Q_pad] view — the singleton keeps
        # the sliced point axis out of the block's last two dims (Mosaic
        # rejects a block dim of 1 over P=4 in the sublane position)
        return pl.BlockSpec(
            (1, 1, 1, 1, TQ),
            lambda b, hh, s, bs, pi, ti, fi: (b, hh, pi[b, hh, s], 0,
                                              ti[b, hh, s]))

    rows5 = (ix.reshape(B, H, P, 1, Q_pad), iyb.reshape(B, H, P, 1, Q_pad),
             aw.reshape(B, H, P, 1, Q_pad))
    kern_v = functools.partial(_bwd_dvtt_kernel_win_pp, win=win, w=w, D=D,
                               cdt=Vh.dtype)
    grid_v = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, H, S),
        in_specs=[
            prow(), prow(), prow(),
            pl.BlockSpec((1, 1, D, TQ),
                         lambda b, hh, s, bs, pi, ti, fi:
                         (b, hh, 0, ti[b, hh, s])),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, N, w),
            lambda b, hh, s, bs, pi, ti, fi: (b, hh, bs[b, hh, s], 0, 0)),
    )
    dVb = pl.pallas_call(
        kern_v,
        grid_spec=grid_v,
        out_shape=jax.ShapeDtypeStruct((B, H, nb, N, w), jnp.float32),
        interpret=_interpret(),
    )(bsort, pidx, tidx, first, *rows5, g)

    # zero bands never selected by any (point, tile) pair
    used = (bflat[:, :, None, :] == jnp.arange(nb)[None, None, :, None]
            ).any(axis=3)                                   # [B,H,nb]
    dVb = jnp.where(used[..., None, None], dVb, 0.0)
    return dVb, dix, diy, daw


def _level_pallas_bwd_win(Vh, bidx, ix, iyb, aw, g, *, win, w, D, P):
    """Banded backward: same contract as ``_level_pallas_bwd`` but with
    band-local coordinates and banded values/grads. Vh are the
    half-band blocks of ``_half_band_blocks`` (band j = blocks j, j+1).

    Valid because clamped coordinates' hat support never leaves the
    selected band (the forward kernel relies on the same invariant), so
    the banded row/value grads equal the full-height grads restricted
    to the band. Returns (dVb f32 [B,H,nb,win*D,w], dix/diy/daw rows) —
    the caller overlap-adds dVb into the full dVtT and masks
    never-selected bands.
    """
    if bidx.ndim == 4:                                     # band="point"
        return _level_pallas_bwd_win_pp(Vh, bidx, ix, iyb, aw, g,
                                        win=win, w=w, D=D, P=P)
    B, H, n_half, Nh, _ = Vh.shape
    N = 2 * Nh
    nb = n_half - 1
    Q_pad = ix.shape[3]
    # the tile is read off bidx: band selection happened at the FORWARD's
    # tile size, but the backward may run narrower tiles (its live set is
    # ~8 buffers vs the forward's 3) — the caller repeats each forward
    # tile's band index across its sub-tiles
    n_tiles = bidx.shape[2]
    assert Q_pad % n_tiles == 0 and bidx.shape == (B, H, n_tiles)
    TQ = Q_pad // n_tiles
    assert TQ % _LANES == 0

    rows_spec = pl.BlockSpec((1, 1, P, TQ),
                             lambda b, hh, t, *refs: (b, hh, 0, t))
    g_spec = pl.BlockSpec((1, 1, D, TQ),
                          lambda b, hh, t, *refs: (b, hh, 0, t))

    kern_r = functools.partial(_bwd_rows_kernel_win, win=win, w=w, D=D,
                               P=P, cdt=Vh.dtype)
    grid_r = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, n_tiles),
        in_specs=[
            rows_spec, rows_spec, rows_spec,
            pl.BlockSpec((1, 1, 1, Nh, w),
                         lambda b, hh, t, bref: (b, hh, bref[b, hh, t],
                                                 0, 0)),
            pl.BlockSpec((1, 1, 1, Nh, w),
                         lambda b, hh, t, bref: (b, hh, bref[b, hh, t] + 1,
                                                 0, 0)),
            g_spec,
        ],
        out_specs=[rows_spec, rows_spec, rows_spec],
    )
    dix, diy, daw = pl.pallas_call(
        kern_r,
        grid_spec=grid_r,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(bidx, ix, iyb, aw, Vh, Vh, g)

    # band-sorted tile order: accumulation runs over consecutive tiles
    perm = jnp.argsort(bidx, axis=2, stable=True).astype(jnp.int32)
    bsort = jnp.take_along_axis(bidx, perm, axis=2)
    first = jnp.concatenate(
        [jnp.ones_like(bsort[:, :, :1]),
         (bsort[:, :, 1:] != bsort[:, :, :-1]).astype(jnp.int32)], axis=2)

    def permed(spec_shape):
        return pl.BlockSpec(
            spec_shape,
            lambda b, hh, t, bref, pref, fref: (b, hh, 0, pref[b, hh, t]))

    kern_v = functools.partial(_bwd_dvtt_kernel_win, win=win, w=w, D=D,
                               P=P, cdt=Vh.dtype)
    grid_v = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, H, n_tiles),
        in_specs=[
            permed((1, 1, P, TQ)), permed((1, 1, P, TQ)),
            permed((1, 1, P, TQ)),
            pl.BlockSpec((1, 1, D, TQ),
                         lambda b, hh, t, bref, pref, fref:
                         (b, hh, 0, pref[b, hh, t])),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, N, w),
            # bref here is bsort: the band of sorted position t
            lambda b, hh, t, bref, pref, fref: (b, hh, bref[b, hh, t],
                                                0, 0)),
    )
    dVb = pl.pallas_call(
        kern_v,
        grid_spec=grid_v,
        out_shape=jax.ShapeDtypeStruct((B, H, nb, N, w), jnp.float32),
        interpret=_interpret(),
    )(bsort, perm, first, ix, iyb, aw, g)

    # zero bands never selected by any tile (their blocks are unwritten)
    used = (bidx[:, :, None, :] == jnp.arange(nb)[None, None, :, None]
            ).any(axis=3)                                   # [B,H,nb]
    dVb = jnp.where(used[..., None, None], dVb, 0.0)
    return dVb, dix, diy, daw


def _level_pallas_bwd(VtT, ix, iy, aw, g, *, h, w, D, P):
    """g: [B,H,D,Q_pad] f32. Returns (dVtT f32 [B,H,h*D,w],
    dix/diy/daw f32 [B,H,P,Q_pad]).

    Two kernels (row grads / value grads) instead of one: the fused
    variant's live set (value tile + 5 [N,TQ] temporaries + the [N,w]
    accumulator and its output buffering) overflows the 16 MB VMEM at the
    800x1344 level-0 shape (N=3200, w=168) — measured 18.4 MB scoped. The
    split halves the peak; the only recomputation is the VPU-cheap
    hat/dT products."""
    B, H, N, _ = VtT.shape
    Q_pad = ix.shape[3]
    TQ = _tq_bwd(N)
    # callers pad to _tq_bwd or a larger 128*2^k tile — both divisible
    assert Q_pad % TQ == 0
    n_tiles = Q_pad // TQ

    rows_spec = pl.BlockSpec((1, 1, P, TQ), lambda b, hh, t: (b, hh, 0, t))
    g_spec = pl.BlockSpec((1, 1, D, TQ), lambda b, hh, t: (b, hh, 0, t))

    kern_r = functools.partial(_bwd_rows_kernel, h=h, w=w, D=D, P=P,
                               cdt=VtT.dtype)
    dix, diy, daw = pl.pallas_call(
        kern_r,
        grid=(B, H, n_tiles),
        in_specs=[
            rows_spec, rows_spec, rows_spec,
            pl.BlockSpec((1, 1, N, w), lambda b, hh, t: (b, hh, 0, 0)),
            g_spec,
        ],
        out_specs=[rows_spec, rows_spec, rows_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, H, P, Q_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(ix, iy, aw, VtT, g)

    kern_v = functools.partial(_bwd_dvtt_kernel, h=h, w=w, D=D, P=P,
                               cdt=VtT.dtype)
    dVtT = pl.pallas_call(
        kern_v,
        grid=(B, H, n_tiles),
        in_specs=[rows_spec, rows_spec, rows_spec, g_spec],
        out_specs=pl.BlockSpec((1, 1, N, w), lambda b, hh, t: (b, hh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, N, w), jnp.float32),
        interpret=_interpret(),
    )(ix, iy, aw, g)

    return dVtT, dix, diy, daw


# --------------------------------------------------------------------------
# level data marshalling
# --------------------------------------------------------------------------

def _orient(h: int, w: int, D: int) -> str:
    """FORWARD contraction orientation minimizing MXU cost for one level.

    Stage-1 cost ~ streamed elements x padded K tiles: orientation "x"
    contracts w (streams h*D sublanes), "y" contracts h (streams w*D).
    Only levels with w > 128 >= h flip in practice (e.g. the 100x168
    level-0 at the 800x1344 train bucket: 3200*2 vs 5376*1 units;
    measured ~7% forward gain at that shape).

    The BACKWARD always stays "x": its ~8 live [N, TQ] buffers with the
    "y" layout's larger N overflow the VMEM budget even at the minimum
    TQ=128 tile, which Mosaic survives only by serializing loads —
    measured 10.8 s vs 0.79 s per full-res MSDA backward. The VJP
    re-marshals from raw (value, loc, aw) residuals, so fwd/bwd are
    free to use different layouts."""
    cost_x = h * D * -(-w // _LANES)
    cost_y = w * D * -(-h // _LANES)
    return "y" if cost_y < cost_x else "x"


def _vtt(value_l, h, w, orient="x"):
    """[B, h*w, H, D] -> [B, H, h*D, w] (orient "x": x minor, n = y*D+d)
    or [B, H, w*D, h] (orient "y": y minor, n = x*D+d)."""
    B, _, H, D = value_l.shape
    v = value_l.reshape(B, h, w, H, D)
    if orient == "x":
        return v.transpose(0, 3, 1, 4, 2).reshape(B, H, h * D, w)
    return v.transpose(0, 3, 2, 4, 1).reshape(B, H, w * D, h)


def _rows_t(sampling_locations, attention_weights):
    """Hoisted row-layout transform for the per-level loops.

    [B,Q,H,L,P,2] / [B,Q,H,L,P] -> ([B,H,L,2,P,Q], [B,H,L,P,Q]) in f32.
    The level loops then take lanes-preserving slices instead of
    transposing each level's rows: XLA fuses this single transpose into
    the producer of the offsets, where the old code materialized 3
    slice+transpose copies per level per direction. Measured effect on
    chip is modest (~0.2 ms/img on the b1 serving step, within-noise at
    the standalone-op level) — the win is mostly fewer fusions for XLA
    to get right and one canonical row layout for both dispatchers."""
    locT = sampling_locations.astype(jnp.float32).transpose(0, 2, 3, 5, 4, 1)
    awT = attention_weights.astype(jnp.float32).transpose(0, 2, 3, 4, 1)
    return locT, awT


def _level_inputs(value_l, ixT, iyT, awT_l, h, w, P, TQ, orient="x"):
    """Transpose values to [B,H,h*D,w]; pad the pre-transposed rows
    (``_rows_t`` slices, [B,H,P,Q]) to query-minor [B,H,P,Q_pad] (zero
    attention weight on the padded queries).

    With orient "y" the returned (ix, iy) are role-swapped to match the
    transposed value layout: "ix" is the contracted-axis coordinate."""
    VtT = _vtt(value_l, h, w, orient)
    Q = ixT.shape[-1]

    ix = ixT * w - 0.5                                     # [B,H,P,Q]
    iy = iyT * h - 0.5
    if orient == "y":
        ix, iy = iy, ix

    Q_pad = -(-Q // TQ) * TQ

    def rows(t):  # [B,H,P,Q] -> [B,H,P,Q_pad]
        if Q_pad != Q:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, Q_pad - Q)))
        return t

    return VtT, rows(ix), rows(iy), rows(awT_l)


def _quantize_level(VtT, ix, iy, aw):
    """Symmetric int8 quantization of one level's values.

    Scale is per (batch, head) over the level slice; both the value
    scale and the 7-bit hat scale (1/127 each) are folded into the
    attention-weight rows, so the kernel's int32 accumulator needs a
    single f32 multiply to dequantize."""
    sv = jnp.max(jnp.abs(VtT.astype(jnp.float32)), axis=(2, 3),
                 keepdims=True)                            # [B,H,1,1]
    sv = jnp.maximum(sv, 1e-12)
    vq = jnp.round(VtT.astype(jnp.float32) * (127.0 / sv)).astype(jnp.int8)
    aw_s = aw * (sv / (127.0 * 127.0))                     # [B,H,P,Qp]
    return vq, ix, iy, aw_s


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


def _msda_pallas_fwd_impl(value, spatial_shapes, sampling_locations,
                          attention_weights, quant=False):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype

    locT, awT = _rows_t(sampling_locations, attention_weights)
    out = None
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        orient = _orient(h, w, D)
        hk, wk = (h, w) if orient == "x" else (w, h)
        TQ = _tq_fwd(hk * D)
        VtT, ix, iy, aw = _level_inputs(
            value_l, locT[:, :, lid, 0], locT[:, :, lid, 1],
            awT[:, :, lid], h, w, P, TQ, orient)
        if quant:
            VtT, ix, iy, aw = _quantize_level(VtT, ix, iy, aw)
        o = _level_pallas_fwd(VtT, ix, iy, aw, h=hk, w=wk, D=D, P=P)
        o = o[:, :, :, :Q]                                  # drop query pad
        out = o if out is None else out + o
        start += h * w
    # [B,H,D,Q] -> [B,Q,H*D]
    out = out.transpose(0, 3, 1, 2).reshape(B, Q, H * D).astype(dtype)
    return out, (value, sampling_locations, attention_weights)


def _msda_pallas_fwd(value, spatial_shapes, sampling_locations,
                     attention_weights):
    return _msda_pallas_fwd_impl(value, spatial_shapes, sampling_locations,
                                 attention_weights)


def _msda_pallas_bwd(spatial_shapes, res, g):
    value, sampling_locations, attention_weights = res
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    # [B, Q, H*D] -> [B, H, D, Q] f32
    gq = g.reshape(B, Q, H, D).transpose(0, 2, 3, 1).astype(jnp.float32)

    locT, awT = _rows_t(sampling_locations, attention_weights)
    dval_parts = []
    dloc_parts = []
    daw_parts = []
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        # the backward re-marshals from raw residuals, so it pads to its
        # OWN tile — decoupled from whatever tiling the forward used
        TQ = _tq_bwd(h * D)
        VtT, ix, iy, aw = _level_inputs(
            value_l, locT[:, :, lid, 0], locT[:, :, lid, 1],
            awT[:, :, lid], h, w, P, TQ)
        Q_pad = ix.shape[3]
        gq_pad = gq if Q_pad == Q else jnp.pad(
            gq, ((0, 0), (0, 0), (0, 0), (0, Q_pad - Q)))

        dVtT, dix, diy, daw = _level_pallas_bwd(
            VtT, ix, iy, aw, gq_pad, h=h, w=w, D=D, P=P)

        # [B,H,h*D,w] -> [B, h*w, H, D]
        dv = (dVtT.reshape(B, H, h, D, w)
              .transpose(0, 2, 4, 1, 3).reshape(B, h * w, H, D))
        dval_parts.append(dv)

        def unrows(t):  # [B,H,P,Q_pad] -> [B,Q,H,P]
            return t[:, :, :, :Q].transpose(0, 3, 1, 2)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def msda_pallas_q(value, spatial_shapes: Sequence[Tuple[int, int]],
                  sampling_locations, attention_weights):
    """int8-stage-1 multi-scale deformable attention (approximate,
    opt-in via ``config.msda_int8``).

    Values are quantized symmetrically to int8 per (batch, head, level)
    and the hat vectors rounded to 7 bits, so stage 1 runs in the MXU's
    double-rate int8 mode. The backward is the exact bf16 path on the
    raw residuals (straight-through estimator), so training gradients
    are identical to the exact kernel's."""
    out, _ = _msda_pallas_q_fwd(value, spatial_shapes, sampling_locations,
                                attention_weights)
    return out


def _msda_pallas_q_fwd(value, spatial_shapes, sampling_locations,
                       attention_weights):
    return _msda_pallas_fwd_impl(value, spatial_shapes, sampling_locations,
                                 attention_weights, quant=True)


msda_pallas_q.defvjp(_msda_pallas_q_fwd, _msda_pallas_bwd)


# --------------------------------------------------------------------------
# windowed (banded) variant — see ops/msda_window.py for the contract
# --------------------------------------------------------------------------

def _win_level_rows(ixT, iyT, awT_l, h, w, win, segs, TQ, per_point=False):
    """Segmented, window-transformed rows for one level, from the
    pre-transposed ``_rows_t`` slices ([B,H,P,Q]).

    Returns (bidx, ix, iy_band, iy_clamped_abs, aw_eff, inband, in_img),
    all in the [B,H,P,Q_pad_total] row layout (bidx is [B,H,T], or
    [B,H,P,T] when ``per_point``)."""
    ix = segment_rows_t(ixT * w - 0.5, segs, TQ)
    iy = segment_rows_t(iyT * h - 0.5, segs, TQ)
    awr = segment_rows_t(awT_l, segs, TQ)
    bidx, iyb, iyc, awe, inband, in_img = window_rows(iy, awr, h, win, TQ,
                                                      per_point)
    return bidx, ix, iyb, iyc, awe, inband, in_img


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def msda_pallas_win(value, spatial_shapes: Sequence[Tuple[int, int]],
                    sampling_locations, attention_weights,
                    window: int, query_segments, band: str = "tile"):
    """Windowed multi-scale deformable attention (approximate, opt-in).

    Levels with h <= window run the exact kernel; taller levels run the
    banded kernel with runtime band selection — one band per query tile
    (band="tile") or one per (query tile, sampling point)
    (band="point"; see ops/msda_window.py window_rows). ``query_segments``
    is the (h, w) raster layout of the queries (encoder self-attention:
    the spatial_shapes themselves) so tiles never straddle levels.
    Gradients match the windowed forward exactly (clamp-masked)."""
    out, _ = _msda_win_fwd(value, spatial_shapes, sampling_locations,
                           attention_weights, window, query_segments, band)
    return out


def _msda_win_fwd(value, spatial_shapes, sampling_locations,
                  attention_weights, window, query_segments, band="tile",
                  quant=False):
    per_point = band == "point"
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype

    locT, awT = _rows_t(sampling_locations, attention_weights)
    out = None
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        ixT, iyT = locT[:, :, lid, 0], locT[:, :, lid, 1]
        awT_l = awT[:, :, lid]
        if h <= window:
            orient = _orient(h, w, D)
            hk, wk = (h, w) if orient == "x" else (w, h)
            TQ = _tq_fwd(hk * D)
            VtT, ix, iy, aw = _level_inputs(value_l, ixT, iyT, awT_l,
                                            h, w, P, TQ, orient)
            if quant:
                VtT, ix, iy, aw = _quantize_level(VtT, ix, iy, aw)
            o = _level_pallas_fwd(VtT, ix, iy, aw,
                                  h=hk, w=wk, D=D, P=P)[:, :, :, :Q]
        else:
            # banding is strictly on y — see msda_window docstring
            TQ = query_tile(window, D, w)
            segs = segment_bounds(Q, query_segments)
            VtT = _vtt(value_l, h, w)
            bidx, ix, iyb, _, awe, _, _ = _win_level_rows(
                ixT, iyT, awT_l, h, w, window, segs, TQ, per_point)
            if quant:
                VtT, ix, iyb, awe = _quantize_level(VtT, ix, iyb, awe)
            Vh = _half_band_blocks(VtT, h, D, window)
            o = _level_pallas_fwd_win(Vh, bidx, ix, iyb, awe,
                                      win=window, w=w, D=D, P=P)
            o = unsegment_cols(o, segs, TQ)
        out = o if out is None else out + o
        start += h * w
    out = out.transpose(0, 3, 1, 2).reshape(B, Q, H * D).astype(dtype)
    return out, (value, sampling_locations, attention_weights)


def _msda_win_bwd(spatial_shapes, window, query_segments, band, res, g):
    """Backward: the exact kernel on the clamp-transformed coordinates
    (full-height values — banding only restricts reachable rows, which
    the clamp already encodes), with d/d_iy masked where the clamp was
    active and d/d_aw masked by the in-image guard."""
    per_point = band == "point"
    value, sampling_locations, attention_weights = res
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    gq = g.reshape(B, Q, H, D).transpose(0, 2, 3, 1).astype(jnp.float32)

    dval_parts = []
    dloc_parts = []
    daw_parts = []
    locT, awT = _rows_t(sampling_locations, attention_weights)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        ixT, iyT = locT[:, :, lid, 0], locT[:, :, lid, 1]
        awT_l = awT[:, :, lid]

        if h <= window:
            TQ = _tq_fwd(h * D)
            VtT, ix, iy, aw = _level_inputs(value_l, ixT, iyT, awT_l,
                                            h, w, P, TQ)
            Q_pad = ix.shape[3]
            gq_pad = gq if Q_pad == Q else jnp.pad(
                gq, ((0, 0), (0, 0), (0, 0), (0, Q_pad - Q)))
            dVtT, dix, diy, daw = _level_pallas_bwd(
                VtT, ix, iy, aw, gq_pad, h=h, w=w, D=D, P=P)

            def unrows(t):
                return t[:, :, :, :Q].transpose(0, 3, 1, 2)
        else:
            # banded backward: streams window*D rows like the forward
            # (the clamp keeps all hat support in-band). Its live set is
            # ~8 buffers vs the forward's 3, so for larger windows it runs
            # NARROWER query tiles than the forward's band selection —
            # each forward tile's band index is repeated across its
            # sub-tiles (every sub-tile clamps to the same band, so the
            # grads are exactly the windowed forward's).
            TQ = query_tile(window, D, w)
            segs = segment_bounds(Q, query_segments)
            gq_seg = segment_cols(gq, segs, TQ)
            bidx, ix, iyb, _, awe, inband, in_img = _win_level_rows(
                ixT, iyT, awT_l, h, w, window, segs, TQ, per_point)
            TQb = min(_tq_bwd(window * D), TQ)
            if TQb < TQ:
                bidx = jnp.repeat(bidx, TQ // TQb, axis=bidx.ndim - 1)
            Vh = _half_band_blocks(_vtt(value_l, h, w), h, D, window)
            dVb, dix, diy, daw = _level_pallas_bwd_win(
                Vh, bidx, ix, iyb, awe, gq_seg,
                win=window, w=w, D=D, P=P)
            # overlap-add band slices back into the full value grad
            # (the padded geometry rows below h carry no real values
            # and are dropped by the final slice)
            starts = band_starts(h, window)
            hgeo = starts[-1] + window
            dVtT = jnp.zeros((B, H, hgeo * D, w), jnp.float32)
            for j, s in enumerate(starts):
                dVtT = dVtT.at[:, :, s * D:(s + window) * D, :].add(
                    dVb[:, :, j])
            dVtT = dVtT[:, :, :h * D]
            diy = diy * inband                     # zero where clamped
            daw = daw * in_img                     # d aw_eff / d aw

            def unrows(t, segs=segs, TQ=TQ):
                return unsegment_rows(t, segs, TQ)

        dv = (dVtT.reshape(B, H, h, D, w)
              .transpose(0, 2, 4, 1, 3).reshape(B, h * w, H, D))
        dval_parts.append(dv)
        dloc = jnp.stack([unrows(dix) * w, unrows(diy) * h], axis=-1)
        dloc_parts.append(dloc)
        daw_parts.append(unrows(daw))
        start += h * w

    dvalue = jnp.concatenate(dval_parts, axis=1).astype(value.dtype)
    dloc = jnp.stack(dloc_parts, axis=3).astype(sampling_locations.dtype)
    daw = jnp.stack(daw_parts, axis=3).astype(attention_weights.dtype)
    return dvalue, dloc, daw


msda_pallas_win.defvjp(_msda_win_fwd, _msda_win_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def msda_pallas_win_q(value, spatial_shapes: Sequence[Tuple[int, int]],
                      sampling_locations, attention_weights,
                      window: int, query_segments, band: str = "tile"):
    """Windowed + int8-stage-1 variant: composes the banded
    approximation with int8 quantization (see ``msda_pallas_q``).
    Backward is the exact windowed bf16 path (straight-through)."""
    out, _ = _msda_win_q_fwd(value, spatial_shapes, sampling_locations,
                             attention_weights, window, query_segments,
                             band)
    return out


def _msda_win_q_fwd(value, spatial_shapes, sampling_locations,
                    attention_weights, window, query_segments,
                    band="tile"):
    return _msda_win_fwd(value, spatial_shapes, sampling_locations,
                         attention_weights, window, query_segments,
                         band, quant=True)


msda_pallas_win_q.defvjp(_msda_win_q_fwd, _msda_win_bwd)
