"""Multi-scale deformable attention — pure-JAX core, TPU-tuned.

TPU-native re-design of the reference CUDA kernel
(model/custom_kernel/cuda/ms_deform_im2col_cuda.cuh:237-299) and its debug
PyTorch twin ``ms_deform_attn_core_pytorch`` (model/deformable_detr.py:925-960).

Semantics: sampling locations are normalized to [0,1]; the pixel-space sample
point is ``loc * size - 0.5`` (identical to ``F.grid_sample(align_corners=
False)`` with grid ``2*loc-1``); bilinear interpolation with zero padding
outside the feature map. Attention weights are already softmaxed over
(levels x points).

Two exact implementations are provided (selected by ``impl``):

``matmul`` (default)
    Separable-hat MXU formulation. Bilinear interpolation along an axis is a
    dot product with the *dense analytic hat vector* — for a fractional pixel
    coordinate ``ix``, ``hx[x] = relu(1 - |ix - x|)`` has exactly the two
    bilinear corner weights as nonzeros and evaluates to zero outside the
    map, reproducing grid_sample's zero padding for free. Sampling therefore
    factorizes into

        stage 1 (MXU):  T[r, y*D+d] = sum_x hx[r, x] * V[x, y*D+d]
        stage 2 (VPU):  out[r, d]   = sum_y (aw[r] * hy[r, y]) * T[r, y, d]

    with r enumerating (query, point) rows. Stage 1 is a large dense matmul
    ([rows, w] @ [w, h*D]) that runs on the systolic array instead of the
    scalar-bound gather unit; on v5e this replaces ~10.7 cycles *per sampled
    row* of gather with ~1e12 MACs/image of cheap MXU work. Rows are
    processed in fixed-size chunks under ``lax.scan`` with ``jax.checkpoint``
    so the [chunk, h*D] intermediate never hits HBM-resident autodiff
    residuals — training memory is O(inputs), not O(patches).

``gather``
    The round-1 path: one ``lax.gather`` of a 2x2xD patch per sampled point
    with hat weights evaluated at the clamped patch corners. Exact, but
    scalar-unit bound (~10.7 cycles/row) and its [N,2,2,D] output layout
    tile-pads the D=32 minor dim 4x. Kept for A/B benchmarking and as the
    fastest path for tiny row counts.

``pallas``
    Same math as ``matmul`` but as a fused Pallas kernel per level (stage-2
    consumes stage-1's VMEM tile; no [rows, h*D] HBM traffic) with a custom
    VJP. See ``egtr_tpu.ops.msda_pallas``. Falls back to ``matmul`` on
    non-TPU backends.

Spatial shapes are STATIC (python tuple) — images are padded to bucketed
shapes so the whole model compiles once per bucket.

Shapes:
    value:              [B, S, H, D]   (S = sum of h*w over levels)
    sampling_locations: [B, Q, H, L, P, 2]  (x, y) in [0, 1]
    attention_weights:  [B, Q, H, L, P]
    returns:            [B, Q, H*D]
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# rows per scan chunk in the matmul path; multiple of 8 sublanes and of
# any n_points so the point-sum stays inside the chunk
_CHUNK_ROWS = 4096


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

def _pixel_coords(loc, h: int, w: int):
    """loc [..., 2] in [0,1] -> fractional pixel coords (ix, iy), fp32."""
    ix = loc[..., 0].astype(jnp.float32) * w - 0.5
    iy = loc[..., 1].astype(jnp.float32) * h - 0.5
    return ix, iy


def _hat(coord, size: int, dtype):
    """Dense analytic hat row: relu(1 - |coord - arange(size)|).

    coord: [..., 1]-broadcastable fp32. Exactly the bilinear corner weights
    (zero-padding semantics included) — see module docstring.
    """
    grid = lax.broadcasted_iota(jnp.float32, coord.shape[:-1] + (size,),
                                coord.ndim - 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord - grid)).astype(dtype)


# --------------------------------------------------------------------------
# matmul (separable hat) implementation
# --------------------------------------------------------------------------

def _level_rows_matmul(Vt, ix, iy, aw, h: int, w: int, D: int):
    """One chunk of rows against one level.

    Vt: [B, H, w, h*D] (x-major transposed values)
    ix, iy, aw: [B, H, C] fp32 (C rows = (query, point) pairs, point minor)
    returns [B, H, C, D] fp32
    """
    cdt = Vt.dtype
    B, H, C = ix.shape
    hx = _hat(ix[..., None], w, cdt)                     # [B,H,C,w]
    # stage 1 — MXU: contract the x axis for every y row at once
    T = lax.dot_general(
        hx, Vt,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )                                                    # [B,H,C,h*D] fp32
    # stage 2 — VPU: y-hat (scaled by the attention weight) times T
    w2 = _hat(iy[..., None], h, jnp.float32) * aw[..., None]   # [B,H,C,h]
    out = jnp.einsum(
        "bhcy,bhcyd->bhcd", w2, T.reshape(B, H, C, h, D),
        preferred_element_type=jnp.float32)
    return out


def _msda_level_matmul(value_l, ix, iy, aw, h: int, w: int, P: int):
    """value_l: [B, h*w, H, D]; ix/iy/aw: [B, H, R] (R = Q*P, point minor).
    Returns [B, H, Q, D] fp32."""
    B, _, H, D = value_l.shape
    R = ix.shape[-1]
    # x-major value transpose: [B, H, w, h*D]
    Vt = (value_l.reshape(B, h, w, H, D)
          .transpose(0, 3, 2, 1, 4)
          .reshape(B, H, w, h * D))

    if R <= _CHUNK_ROWS:
        out = _level_rows_matmul(Vt, ix, iy, aw, h, w, D)  # [B,H,R,D]
        return out.reshape(B, H, R // P, P, D).sum(3)

    # pad rows to a chunk multiple (aw=0 rows contribute exactly zero)
    n_chunks = -(-R // _CHUNK_ROWS)
    pad = n_chunks * _CHUNK_ROWS - R

    def prep(t):
        t = jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
        return (t.reshape(B, H, n_chunks, _CHUNK_ROWS)
                .transpose(2, 0, 1, 3))                  # [N,B,H,C]

    xs = (prep(ix), prep(iy), prep(aw))

    @jax.checkpoint
    def body(carry, x):
        ixc, iyc, awc = x
        out = _level_rows_matmul(Vt, ixc, iyc, awc, h, w, D)
        return carry, out.reshape(B, H, _CHUNK_ROWS // P, P, D).sum(3)

    _, outs = lax.scan(body, None, xs)                   # [N,B,H,C/P,D]
    out = outs.transpose(1, 2, 0, 3, 4).reshape(B, H, -1, D)
    return out[:, :, : R // P]


def _msda_matmul(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype

    out = jnp.zeros((B, H, Q, D), jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        loc = sampling_locations[:, :, :, lid]           # [B,Q,H,P,2]
        ix, iy = _pixel_coords(loc, h, w)                # [B,Q,H,P]
        aw = attention_weights[:, :, :, lid].astype(jnp.float32)

        def rows(t):  # [B,Q,H,P] -> [B,H,Q*P] (point minor)
            return t.transpose(0, 2, 1, 3).reshape(B, H, Q * P)

        out = out + _msda_level_matmul(
            value_l, rows(ix), rows(iy), rows(aw), h, w, P)
        start += h * w
    # [B,H,Q,D] -> [B,Q,H*D]
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(dtype)


# --------------------------------------------------------------------------
# gather implementation (round-1 path)
# --------------------------------------------------------------------------

def _patch_gather(value_l, y0, x0, h: int, w: int):
    """Gather 2x2xD patches. value_l: [B,H,h,w,D]; y0/x0: [B,H,N] int32.
    Returns [B,H,N,2,2,D]. Starts are clamped in-bounds by XLA."""
    D = value_l.shape[-1]
    starts = jnp.stack([y0, x0], axis=-1)  # [B,H,N,2]

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def one(v, s):  # v: [h,w,D], s: [N,2]
        return lax.gather(v, s, dnums, slice_sizes=(2, 2, D),
                          mode=lax.GatherScatterMode.CLIP)

    return jax.vmap(jax.vmap(one))(value_l, starts)


def _msda_gather(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape

    dtype = value.dtype
    acc_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    out = jnp.zeros((B, Q, H, D), dtype=acc_dtype)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = lax.slice_in_dim(value, start, start + h * w, axis=1)
        # [B, h*w, H, D] -> [B, H, h, w, D]
        value_l = value_l.reshape(B, h, w, H, D).transpose(0, 3, 1, 2, 4)
        if h < 2 or w < 2:
            # degenerate level: zero-pad to 2x2 so the patch gather is legal;
            # hat weights at padded corners hit zeros (exact zero-padding)
            value_l = jnp.pad(value_l, ((0, 0), (0, 0), (0, max(2 - h, 0)),
                                        (0, max(2 - w, 0)), (0, 0)))

        loc = sampling_locations[:, :, :, lid]          # [B,Q,H,P,2]
        ix, iy = _pixel_coords(loc, h, w)               # [B,Q,H,P]
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)

        # clamped patch start (what the gather actually reads)
        y0c = jnp.clip(y0, 0, max(h - 2, 0))
        x0c = jnp.clip(x0, 0, max(w - 2, 0))

        def bhn(t):  # [B,Q,H,P] -> [B,H,Q*P]
            return t.transpose(0, 2, 1, 3).reshape(B, H, Q * P)

        patches = _patch_gather(value_l, bhn(y0c), bhn(x0c), h, w)
        # [B,H,N,2,2,D] -> [B,Q,H,P,2,2,D]
        patches = patches.reshape(B, H, Q, P, 2, 2, D).transpose(
            0, 2, 1, 3, 4, 5, 6)

        # hat weights at the clamped corner coordinates reproduce bilinear
        # + zero padding exactly (see module docstring)
        ry = jnp.stack([y0c, y0c + 1], axis=-1).astype(jnp.float32)  # [B,Q,H,P,2]
        rx = jnp.stack([x0c, x0c + 1], axis=-1).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None] - ry))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None] - rx))
        wcorner = wy[..., :, None] * wx[..., None, :]    # [B,Q,H,P,2,2]

        aw = attention_weights[:, :, :, lid].astype(jnp.float32)  # [B,Q,H,P]
        wfull = (wcorner * aw[..., None, None]).astype(dtype)
        # elementwise multiply + reduce (VPU) — do NOT let this become a
        # dot_general over the tiny (2,2) dims, and keep the big patch
        # tensor in the compute dtype (no 13M-element converts); the
        # 16-way sum runs over one flattened sublane axis
        weighted = (patches.reshape(B, Q, H, P * 4, D)
                    * wfull.reshape(B, Q, H, P * 4, 1)).sum(axis=3)
        out = out + weighted.astype(acc_dtype)
        start += h * w
    return out.reshape(B, Q, H * D).astype(dtype)


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def _ambient_batch_axis(batch_size: int):
    """Name of the active mesh's data axis if the batch is sharded over
    more than one device along it (and divisibly), else None."""
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return None
    if am is None or not am.shape_tuple:
        return None
    from ..parallel.mesh import DATA_AXIS
    n = dict(am.shape_tuple).get(DATA_AXIS, 1)
    if n > 1 and batch_size % n == 0:
        return DATA_AXIS
    return None


def _msda_matmul_windowed(value, spatial_shapes, sampling_locations,
                          attention_weights, window, query_segments,
                          band="tile"):
    """Windowed approximation via the exact matmul path on
    clamp-transformed coordinates (ops/msda_window.py) — the CPU-testable
    oracle for the banded Pallas kernel: banding only restricts which y
    rows a sample can reach, which the clamp encodes exactly."""
    from .msda_window import windowed_level_coords

    D = value.shape[3]
    Q = sampling_locations.shape[1]
    locs, aws = [], []
    for lid, (h, w) in enumerate(spatial_shapes):
        loc_l = sampling_locations[:, :, :, lid]
        aw_l = attention_weights[:, :, :, lid]
        if h <= window:
            locs.append(loc_l.astype(jnp.float32))
            aws.append(aw_l.astype(jnp.float32))
        else:
            loc2, aw2 = windowed_level_coords(
                loc_l, aw_l, h, w, window, query_segments, Q, D,
                per_point=band == "point")
            locs.append(loc2.astype(jnp.float32))
            aws.append(aw2)
    loc = jnp.stack(locs, axis=3).astype(sampling_locations.dtype)
    aw = jnp.stack(aws, axis=3).astype(attention_weights.dtype)
    return _msda_matmul(value, spatial_shapes, loc, aw)


def ms_deform_attn(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    impl: str = "auto",
    window: int = 0,
    query_segments=None,
    int8: bool = False,
    band: str = "tile",
) -> jax.Array:
    """Pure-JAX multi-scale deformable attention (forward; differentiable).

    impl: "matmul" | "gather" | "pallas" | "auto". "auto" picks the fused
    Pallas kernel on TPU backends and the XLA matmul path elsewhere.

    window > 0 enables the opt-in banded approximation (see
    ops/msda_window.py): levels taller than ``window`` clamp each query
    tile's samples to a runtime-selected y-band of that height.
    ``query_segments`` must then give the raster layout of the queries
    (encoder self-attention: the spatial_shapes); pass None for
    non-raster queries only if window == 0.

    band: "tile" selects ONE band per query tile (all P points share
    it); "point" selects a band PER SAMPLING POINT (same MXU cost,
    2P half-band fetches per tile instead of 2) — invariant to each
    point's mean offset, so only within-tile per-point spread clamps.

    int8 = True (opt-in, ``config.msda_int8``) quantizes the stage-1
    contraction (values to int8 per batch/head/level, hat vectors to 7
    bits) for the MXU's double-rate int8 mode; gradients remain the
    exact bf16 path (straight-through). Always routes to the Pallas
    kernel (interpreted on CPU).
    """
    assert len(spatial_shapes) == sampling_locations.shape[3]
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if query_segments is not None:
        query_segments = tuple((int(h), int(w)) for h, w in query_segments)
    window = int(window)
    if window > 0 and query_segments is None:
        raise ValueError("windowed MSDA requires query_segments "
                         "(raster layout of the queries)")
    if window % 2:
        raise ValueError(f"windowed MSDA requires an even window (a band "
                         f"is two half-band blocks), got {window}")
    if band not in ("tile", "point"):
        raise ValueError(f"msda band must be 'tile' or 'point', got "
                         f"{band!r}")

    if int8:
        if impl not in ("auto", "pallas"):
            raise ValueError(
                f"int8 stage-1 is a Pallas-kernel feature; impl={impl!r} "
                "cannot honor it (drop int8 or use impl='pallas'/'auto')")
        impl = "pallas"
    elif impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "matmul"
    # explicit impl="pallas" ALWAYS routes to the kernels (interpret mode
    # on CPU) — a silent matmul substitution made every CPU test of the
    # dispatch-level pallas path vacuous (a banded-backward NameError
    # shipped green behind it); only "auto" picks matmul on CPU, for speed
    if impl == "pallas":
        from .msda_pallas import (msda_pallas, msda_pallas_q,
                                  msda_pallas_win, msda_pallas_win_q)
        if window > 0:
            win_op = msda_pallas_win_q if int8 else msda_pallas_win

            def fn(v, l, a):
                return win_op(v, spatial_shapes, l, a,
                              window, query_segments, band)
        else:
            op = msda_pallas_q if int8 else msda_pallas

            def fn(v, l, a):
                return op(v, spatial_shapes, l, a)
        axis = _ambient_batch_axis(value.shape[0])
        if axis is not None:
            # Under a data-parallel mesh the XLA SPMD partitioner cannot
            # split a pallas custom call — it would all-gather the batch
            # and run the kernel replicated. shard_map runs it per-shard
            # (every operand and the output are batch-leading).
            from jax.sharding import PartitionSpec
            spec = PartitionSpec(axis)
            fn = jax.shard_map(fn, in_specs=(spec, spec, spec),
                               out_specs=spec, check_vma=False)
        return fn(value, sampling_locations, attention_weights)
    if impl == "matmul":
        if window > 0:
            return _msda_matmul_windowed(value, spatial_shapes,
                                         sampling_locations,
                                         attention_weights, window,
                                         query_segments, band)
        return _msda_matmul(value, spatial_shapes, sampling_locations,
                            attention_weights)
    if impl == "gather":
        if window > 0:
            raise ValueError("windowed MSDA is not supported on the "
                             "gather path")
        return _msda_gather(value, spatial_shapes, sampling_locations,
                            attention_weights)
    raise ValueError(f"unknown msda impl: {impl!r}")
