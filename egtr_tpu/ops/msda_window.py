"""Windowed (banded) approximation for multi-scale deformable attention.

Opt-in inference/training speedup (``config.msda_window``): the exact
separable-hat kernel's MXU cost per query row is proportional to N = h*D
(every y row of the level is streamed for every sampled point, see
ops/msda_pallas.py). Encoder self-attention queries are raster-ordered and
deformable sampling offsets are a few pixels in practice (the reference
initializes them within +-n_points px, deformable_detr.py:999-1019), so a
tile of adjacent queries samples a narrow y-band of the level. Windowing
views the level's values as overlapping y-bands of height WIN (stride
WIN/2; each band = two consecutive half-band blocks of a free reshape, so
nothing is materialized), picks one band per query tile at runtime from
the attention-weighted mean sample row, and clamps in-image samples to
the band; N shrinks from h*D to WIN*D.

Approximation contract:
  - samples whose y lands inside the selected band (the overwhelming
    majority for raster-local queries): bit-identical to the exact path;
  - in-image samples outside the band: y clamped to the band edge
    (x stays exact);
  - out-of-image samples: exactly zero, as in the exact path (the
    windowed path applies the zero-padding guard explicitly, so the
    clamp can never resurrect a sample the exact path would drop).

Gradients are exactly consistent with the windowed forward: the backward
runs the exact kernel on the clamp-transformed coordinates and masks
d/d_iy where the clamp was active (ops/msda_pallas.py windowed VJP).

Query tiles must not straddle raster discontinuities, so the caller
passes ``query_segments`` (the per-level (h, w) of the *query* grid —
for encoder self-attention, exactly ``spatial_shapes``) and each
segment's rows are padded to a tile multiple independently.

This module holds the pure-XLA pieces shared by the Pallas kernel path
and the (CPU-testable) matmul fallback: band geometry, query
segmentation, runtime band selection, and the coordinate transform.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_LANES = 128


def fit_tile(N: int, n_bufs: int, budget=12 * 2 ** 20) -> int:
    """Largest query tile (multiple of 128 lanes) whose ~n_bufs live
    [N, TQ] f32 temporaries fit the VMEM budget."""
    tq = 4 * _LANES
    while tq > _LANES and n_bufs * tq * N * 4 > budget:
        tq //= 2
    return max(tq, _LANES)


def query_tile(win: int, D: int, w: int, n_bufs: int = 3) -> int:
    """Query-tile width for a banded level: the VMEM-fit tile
    (``fit_tile``), capped to the largest 128*2^k tile whose raster
    queries span at most win/4 rows of a w-wide level. A tile's own
    query span eats band slack exactly like a sampling offset (the band
    is centered on the tile's weighted-mean sample row, and band starts
    quantize to the win/2 stride, costing up to win/4 of slack by
    themselves), so tiles on narrow levels must shrink for small
    windows to stay accurate — at w=63, a 512-query tile spans ~8 rows,
    consuming a window-8 band before a single offset is applied.
    Power-of-two multiples of 128 keep the forward and the (narrower)
    backward tiles nesting cleanly."""
    cap = _LANES
    while cap * 2 <= max(w * win // 4, _LANES):
        cap *= 2
    return min(fit_tile(win * D, n_bufs), cap)


def band_stride(win: int) -> int:
    return max(win // 2, 1)


def band_starts(h: int, win: int) -> Tuple[int, ...]:
    """Static start rows of overlapping y-bands of height ``win``
    covering [0, h). Every start is a multiple of the stride (win/2), so
    band j is exactly half-band blocks (j, j+1) of the stride-height
    row split — the Pallas path selects those as two Blocked refs over a
    FREE reshape instead of materializing a stacked band copy (~2x the
    values in HBM, measured 10-20 ms of the windowed full-res train
    step). The last band may overhang h; the overhang rows are
    zero-padded values, which is exactly the exact path's zero-padding
    semantics below the image (the in-image guard already zeroes
    samples at iy >= h)."""
    if h <= win:
        return (0,)
    stride = band_stride(win)
    n = -(-(h - win) // stride) + 1
    return tuple(b * stride for b in range(n))


def segment_bounds(Q: int, query_segments) -> Tuple[Tuple[int, int], ...]:
    """(start, length) per raster-contiguous query segment."""
    if not query_segments:
        return ((0, Q),)
    segs = []
    q0 = 0
    for (sh, sw) in query_segments:
        segs.append((q0, sh * sw))
        q0 += sh * sw
    assert q0 == Q, f"query_segments cover {q0} queries, expected {Q}"
    return tuple(segs)


def segment_rows(t, segs, TQ: int):
    """[B, Q, H, P] -> [B, H, P, Q_pad_total], each segment zero-padded
    to a TQ multiple so no query tile straddles two segments."""
    parts = []
    for (q0, qs) in segs:
        seg = t[:, q0:q0 + qs].transpose(0, 2, 3, 1)
        qsp = -(-qs // TQ) * TQ
        if qsp != qs:
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, 0), (0, qsp - qs)))
        parts.append(seg)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def segment_rows_t(t, segs, TQ: int):
    """Pre-transposed variant of ``segment_rows``: t is already
    [B, H, P, Q] (query minor), so each segment is a lanes-axis slice +
    zero-pad to a TQ multiple — no per-level transpose. Used by the
    pallas dispatchers, which hoist the [B,Q,H,L,P]->[B,H,L,P,Q]
    transpose out of the level loop (one producer-fused transpose
    instead of 3 materialized slice+transpose ops per level)."""
    parts = []
    for (q0, qs) in segs:
        seg = t[..., q0:q0 + qs]
        qsp = -(-qs // TQ) * TQ
        if qsp != qs:
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, 0), (0, qsp - qs)))
        parts.append(seg)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _seg_slices(segs, TQ: int):
    out = []
    qp0 = 0
    for (q0, qs) in segs:
        out.append((qp0, qs))
        qp0 += -(-qs // TQ) * TQ
    return out


def unsegment_rows(rows, segs, TQ: int):
    """[B, H, P, Q_pad_total] -> [B, Q, H, P] (drops segment padding)."""
    parts = [rows[..., qp0:qp0 + qs] for (qp0, qs) in _seg_slices(segs, TQ)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return out.transpose(0, 3, 1, 2)


def unsegment_cols(out, segs, TQ: int):
    """[B, H, D, Q_pad_total] -> [B, H, D, Q] (drops segment padding)."""
    parts = [out[..., qp0:qp0 + qs] for (qp0, qs) in _seg_slices(segs, TQ)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def segment_cols(g, segs, TQ: int):
    """[B, H, D, Q] -> [B, H, D, Q_pad_total] (inverse of unsegment_cols)."""
    parts = []
    for (q0, qs) in segs:
        seg = g[..., q0:q0 + qs]
        qsp = -(-qs // TQ) * TQ
        if qsp != qs:
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, 0), (0, qsp - qs)))
        parts.append(seg)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def window_rows(iy, aw, h: int, win: int, TQ: int, per_point: bool = False):
    """Runtime band selection + coordinate transform, in row space.

    iy, aw: [B, H, P, Q_pad] f32 (segmented; padded rows must carry aw=0).
    Returns (bidx i32, iy_band, iy_clamped_abs, aw_eff, inband,
    in_image), where iy_band = iy_clamped_abs - band_start is the
    band-local coordinate the banded kernel consumes.

    ``per_point=False`` (band="tile"): ONE band per query tile — bidx is
    [B,H,T], chosen from the attention-weighted mean sample row over all
    P points of the tile. ``per_point=True`` (band="point"): each of the
    P sampling points selects its OWN band — bidx is [B,H,P,T]. Per-point
    selection is invariant to a point's mean offset (a point whose
    samples sit 40 rows above the queries still lands mid-band); only the
    WITHIN-tile spread of one point's samples can clamp, so trained
    offsets of any magnitude stay exact as long as nearby queries deform
    coherently. MXU cost is identical (each point's stage-1 dot streams
    the same win*D rows, just from its own band); the only extra cost is
    fetching 2P half-band blocks per tile instead of 2.
    """
    B, H, P, Qp = iy.shape
    T = Qp // TQ
    in_img = (iy > -1.0) & (iy < float(h))
    awe = jnp.where(in_img, aw, 0.0)

    starts = band_starts(h, win)
    # weighted mean sample row (per tile, or per (point, tile)) -> nearest band
    wt = awe.reshape(B, H, P, T, TQ)
    iyt = iy.reshape(B, H, P, T, TQ)
    red = (4,) if per_point else (2, 4)
    den = wt.sum(axis=red)
    c = (iyt * wt).sum(axis=red) / jnp.maximum(den, 1e-6)
    ideal = (c - (win - 1) / 2.0) / band_stride(win)
    bidx = jnp.clip(jnp.round(ideal), 0, len(starts) - 1).astype(jnp.int32)

    sb = jnp.take(jnp.asarray(starts, jnp.float32), bidx)
    if per_point:
        sbr = jnp.repeat(sb, TQ, axis=-1)                     # [B,H,P,Qp]
    else:
        sbr = jnp.repeat(sb, TQ, axis=-1)[:, :, None, :]      # [B,H,1,Qp]
    # clamp to the band edge, EXCEPT where the band touches the image
    # edge: there the hat + in-image guard already reproduce the exact
    # partial-weight/zero-pad behaviour for the (-1, 0) and (h-1, h)
    # fringes, so clamping would wrongly promote partial weights to 1
    lo = jnp.where(sbr > 0, sbr, -1.0)
    hi = jnp.where(sbr + win < h, sbr + (win - 1.0), float(h))
    iyc = jnp.clip(iy, lo, hi)
    inband = in_img & (iy >= lo) & (iy <= hi)
    return bidx, iyc - sbr, iyc, awe, inband, in_img


def windowed_level_coords(loc_l, aw_l, h: int, w: int, win: int,
                          query_segments, Q: int, D: int,
                          per_point: bool = False):
    """Matmul-fallback transform: absolute clamped (loc, aw) for one level.

    loc_l: [B,Q,H,P,2], aw_l: [B,Q,H,P]. Returns (loc', aw') with the
    windowed path's clamped y and zero-padded-out-of-image weights, in the
    original [B,Q,H,P,(2)] layout — feeding these to the *exact* kernel
    reproduces the windowed computation (values are never banded in the
    fallback; banding only changes which rows the kernel can reach, which
    the clamp already encodes).

    Banding is strictly on y: raster-ordered query tiles (TQ >= 128
    queries) span entire rows of the level, so per-tile locality exists
    only in y — an x-band would clamp nearly every sample (measured:
    banding the 100x168 full-res level 0 on x to save one 128-lane K
    tile destroys the in-band-exactness contract).
    """
    TQ = query_tile(win, D, w)
    segs = segment_bounds(Q, query_segments)
    iy = segment_rows(loc_l[..., 1].astype(jnp.float32) * h - 0.5, segs, TQ)
    awr = segment_rows(aw_l.astype(jnp.float32), segs, TQ)
    _, _, iyc, awe, _, _ = window_rows(iy, awr, h, win, TQ, per_point)
    iyc_q = unsegment_rows(iyc, segs, TQ)                     # [B,Q,H,P]
    awe_q = unsegment_rows(awe, segs, TQ)
    loc_y = (iyc_q + 0.5) / h
    loc2 = jnp.stack(
        [loc_l[..., 0].astype(jnp.float32), loc_y], axis=-1)
    return loc2.astype(loc_l.dtype), awe_q
