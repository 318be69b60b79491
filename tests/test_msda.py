"""Parity tests for the pure-JAX multi-scale deformable attention core.

Oracle: torch.nn.functional.grid_sample with align_corners=False / zero
padding, composed exactly like the reference debug implementation
(model/deformable_detr.py:925-960). torch (CPU) is a test-only dependency.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egtr_tpu.ops.msda import ms_deform_attn

torch = pytest.importorskip("torch")


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    sampling_locations = torch.from_numpy(sampling_locations)
    attention_weights = torch.from_numpy(attention_weights)
    N, S, M, D = value.shape
    _, Lq, M, L, P, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = value_list[lid].flatten(2).transpose(1, 2).reshape(N * M, D, h, w)
        grid_l = sampling_grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(
            value_l, grid_l, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        )
        sampling_value_list.append(sampled)
    attention_weights = attention_weights.transpose(1, 2).reshape(
        N * M, 1, Lq, L * P
    )
    out = (
        (torch.stack(sampling_value_list, dim=-2).flatten(-2) * attention_weights)
        .sum(-1)
        .view(N, M * D, Lq)
    )
    return out.transpose(1, 2).contiguous().numpy()


def make_inputs(rng, B=2, Q=7, H=4, D=8, shapes=((6, 9), (3, 5), (2, 2))):
    L = len(shapes)
    P = 4
    S = sum(h * w for h, w in shapes)
    value = rng.standard_normal((B, S, H, D)).astype(np.float32)
    # locations roam slightly outside [0,1] to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, H, L, P, 2)).astype(np.float32)
    aw = rng.uniform(0, 1, size=(B, Q, H, L * P)).astype(np.float32)
    aw = aw / aw.sum(-1, keepdims=True)
    aw = aw.reshape(B, Q, H, L, P)
    return value, shapes, loc, aw


IMPLS = ["gather", "matmul", "pallas"]


@pytest.mark.parametrize("impl", IMPLS)
def test_msda_matches_grid_sample_oracle(rng, impl):
    value, shapes, loc, aw = make_inputs(rng)
    ref = torch_oracle(value, shapes, loc, aw)
    out = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                         jnp.array(aw), impl=impl)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["matmul", "pallas"])
def test_msda_production_head_dim(rng, impl):
    # D=32 is the deployed head dim; exercises the lane-fold paths
    value, shapes, loc, aw = make_inputs(rng, B=1, Q=9, H=2, D=32,
                                         shapes=((5, 7), (3, 3)))
    ref = torch_oracle(value, shapes, loc, aw)
    out = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                         jnp.array(aw), impl=impl)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


def test_msda_matmul_chunked_path(rng, monkeypatch):
    # force the lax.scan row-chunking (rows > chunk) and row padding
    from egtr_tpu.ops import msda as msda_mod

    monkeypatch.setattr(msda_mod, "_CHUNK_ROWS", 64)
    value, shapes, loc, aw = make_inputs(rng, B=1, Q=37, H=2, D=4,
                                         shapes=((6, 9), (3, 5)))
    ref = torch_oracle(value, shapes, loc, aw)
    out = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                         jnp.array(aw), impl="matmul")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)

    # gradients flow through the chunked scan body
    def f(v, l, a):
        return msda_mod.ms_deform_attn(v, shapes, l, a, impl="matmul").sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(aw))
    ref_g = jax.grad(
        lambda v, l, a: msda_mod.ms_deform_attn(
            v, shapes, l, a, impl="gather").sum(),
        argnums=(0, 1, 2))(jnp.array(value), jnp.array(loc), jnp.array(aw))
    for g, gr in zip(grads, ref_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", IMPLS)
def test_msda_exact_interior_point(rng, impl):
    # a sample exactly at a pixel center must return that pixel's value
    shapes = ((4, 4),)
    B, Q, H, D, P = 1, 1, 1, 2, 1
    value = rng.standard_normal((B, 16, H, D)).astype(np.float32)
    # pixel (y=2, x=1): loc = (x + 0.5)/w, (y + 0.5)/h
    loc = np.array([(1 + 0.5) / 4, (2 + 0.5) / 4], np.float32).reshape(B, Q, H, 1, P, 2)
    aw = np.ones((B, Q, H, 1, P), np.float32)
    out = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                         jnp.array(aw), impl=impl)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0], value[0, 2 * 4 + 1, 0], atol=1e-6
    )


@pytest.mark.parametrize("impl", IMPLS)
def test_msda_gradients_flow(rng, impl):
    value, shapes, loc, aw = make_inputs(rng, B=1, Q=3)

    def f(v, l, a):
        return ms_deform_attn(v, shapes, l, a, impl=impl).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(aw)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # grad wrt value should be nonzero somewhere
    assert np.abs(np.asarray(grads[0])).sum() > 0


def test_msda_pallas_orient_y_level(rng):
    # (96, 130) flips the per-level contraction orientation (contracting
    # h=96 needs one 128-lane K tile vs two for w=130); (4, 6) stays "x".
    # fwd + bwd must match the torch oracle / matmul path either way.
    from egtr_tpu.ops.msda_pallas import _orient
    shapes = ((96, 130), (4, 6))
    assert _orient(96, 130, 8) == "y" and _orient(4, 6, 8) == "x"
    value, shapes, loc, aw = make_inputs(rng, B=1, Q=5, H=2, D=8,
                                         shapes=shapes)
    ref = torch_oracle(value, shapes, loc, aw)
    out = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                         jnp.array(aw), impl="pallas")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)

    def f(impl):
        def g(v, l, a):
            return (ms_deform_attn(v, shapes, l, a, impl=impl)
                    * jnp.arange(out.size).reshape(out.shape)).sum()
        return jax.grad(g, argnums=(0, 1, 2))(
            jnp.array(value), jnp.array(loc), jnp.array(aw))

    gp = f("pallas")
    gm = f("matmul")
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# windowed (banded) approximation — ops/msda_window.py
# ---------------------------------------------------------------------------

def make_raster_inputs(rng, shapes, H=2, D=8, P=4, max_offset_px=1.0):
    """Encoder-like inputs: queries are the raster tokens of `shapes`,
    reference points at their own pixel centers, offsets <= max_offset_px."""
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    Q = S
    value = rng.standard_normal((B := 1, S, H, D)).astype(np.float32)
    refs = []
    for (h, w) in shapes:
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        refs.append(np.stack([(xx.ravel() + 0.5) / w,
                              (yy.ravel() + 0.5) / h], -1))
    ref = np.concatenate(refs, 0)                            # [Q, 2]
    wh = np.array([[w, h] for (h, w) in shapes], np.float32)  # [L, 2]
    off = rng.uniform(-max_offset_px, max_offset_px,
                      (B, Q, H, L, P, 2)).astype(np.float32)
    loc = ref[None, :, None, None, None, :] + off / wh[None, None, None, :,
                                                       None, :]
    aw = rng.uniform(0, 1, size=(B, Q, H, L * P)).astype(np.float32)
    aw = (aw / aw.sum(-1, keepdims=True)).reshape(B, Q, H, L, P)
    return value, loc.astype(np.float32), aw


def test_msda_windowed_inband_is_exact(rng):
    # wide level so one 512-query tile spans ~2 raster rows: every sample
    # stays inside the selected band -> windowed must equal exact
    shapes = ((10, 256),)
    value, loc, aw = make_raster_inputs(rng, shapes, max_offset_px=1.0)
    exact = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                           jnp.array(aw), impl="pallas")
    for impl in ("pallas", "matmul"):
        win = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                             jnp.array(aw), impl=impl, window=8,
                             query_segments=shapes)
        np.testing.assert_allclose(np.asarray(win), np.asarray(exact),
                                   atol=1e-5, rtol=1e-4)


def test_msda_windowed_pallas_matches_matmul_fallback(rng):
    # arbitrary (non-local) samples: both windowed paths share the
    # clamp transform, so they must agree even when samples clamp
    shapes = ((16, 16), (8, 8))
    value, shapes, loc, aw = make_inputs(
        rng, B=2, Q=sum(h * w for h, w in shapes), H=2, D=8, shapes=shapes)
    a = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                       jnp.array(aw), impl="pallas", window=8,
                       query_segments=shapes)
    b = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                       jnp.array(aw), impl="matmul", window=8,
                       query_segments=shapes)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-4)


def test_msda_windowed_grads_match_fallback(rng):
    shapes = ((16, 16),)
    value, shapes, loc, aw = make_inputs(
        rng, B=1, Q=256, H=2, D=8, shapes=shapes)

    def f(impl):
        def g(v, l, a):
            return ms_deform_attn(v, shapes, l, a, impl=impl, window=8,
                                  query_segments=shapes).sum()
        return jax.grad(g, argnums=(0, 1, 2))(
            jnp.array(value), jnp.array(loc), jnp.array(aw))

    gp, gm = f("pallas"), f("matmul")
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_msda_windowed_bwd_subtile_grads(rng):
    """Forces the banded backward's NARROW-tile path (taken when its ~8
    live buffers shrink the tile below the forward's band-selection tile:
    _tq_bwd(window*D) < _tq_fwd(window*D), e.g. D=128 w/ window=8 or the
    documented window=32/D=32 config). Each forward tile's band index is
    repeated across the backward sub-tiles; grads must still match the
    matmul fallback exactly."""
    from egtr_tpu.ops.msda_pallas import _tq_bwd
    from egtr_tpu.ops.msda_window import query_tile

    D, window = 128, 16
    shapes = ((32, 64),)
    (h, w), = shapes
    assert _tq_bwd(window * D) < query_tile(window, D, w), (
        "test no longer exercises the sub-tile path — pick dims where "
        "the bwd tile is smaller than the (row-budget-capped) fwd tile")
    value, shapes, loc, aw = make_inputs(
        rng, B=1, Q=h * w, H=2, D=D, shapes=shapes)

    def f(impl):
        def g(v, l, a):
            return ms_deform_attn(v, shapes, l, a, impl=impl, window=window,
                                  query_segments=shapes).sum()
        return jax.grad(g, argnums=(0, 1, 2))(
            jnp.array(value), jnp.array(loc), jnp.array(aw))

    gp, gm = f("pallas"), f("matmul")
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_msda_windowed_per_point_bands_beat_tile(rng):
    """band="point": each sampling point selects its own band, so large
    but per-point-coherent offsets stay EXACT where band="tile" (one
    band for all P points) must clamp. Points get constant offsets of
    -12/-4/+4/+10 rows: the per-tile spread (~24 rows) cannot fit a
    window-8 band, but each point's within-tile spread (~2 raster rows
    at w=256) trivially does."""
    h, w, H, D, P = 32, 256, 2, 8, 4
    shapes = ((h, w),)
    Q = h * w
    value = rng.standard_normal((1, Q, H, D)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ref = np.stack([(xx.ravel() + 0.5) / w, (yy.ravel() + 0.5) / h], -1)
    off_rows = np.array([-12.0, -4.0, 4.0, 10.0], np.float32)
    off = np.zeros((1, Q, H, 1, P, 2), np.float32)
    off[..., 1] = off_rows / h                      # constant per point
    off[..., 0] = rng.uniform(-1, 1, (1, Q, H, 1, P)) / w
    loc = (ref[None, :, None, None, None, :] + off).astype(np.float32)
    aw = rng.uniform(0.1, 1, size=(1, Q, H, P)).astype(np.float32)
    aw = (aw / aw.sum(-1, keepdims=True)).reshape(1, Q, H, 1, P)

    exact = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                           jnp.array(aw), impl="pallas")
    for impl in ("pallas", "matmul"):
        pp = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                            jnp.array(aw), impl=impl, window=8,
                            query_segments=shapes, band="point")
        np.testing.assert_allclose(np.asarray(pp), np.asarray(exact),
                                   atol=1e-5, rtol=1e-4)
    tile = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                          jnp.array(aw), impl="matmul", window=8,
                          query_segments=shapes, band="tile")
    assert np.abs(np.asarray(tile) - np.asarray(exact)).max() > 1e-3, \
        "per-tile banding unexpectedly exact — test no longer distinguishes"


def test_msda_windowed_pp_pallas_matches_matmul_fallback(rng):
    # arbitrary (non-local) samples: both per-point paths share the
    # clamp transform, so they must agree even when samples clamp
    shapes = ((16, 16), (8, 8))
    value, shapes, loc, aw = make_inputs(
        rng, B=2, Q=sum(h * w for h, w in shapes), H=2, D=8, shapes=shapes)
    a = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                       jnp.array(aw), impl="pallas", window=8,
                       query_segments=shapes, band="point")
    b = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                       jnp.array(aw), impl="matmul", window=8,
                       query_segments=shapes, band="point")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("D,window,shapes", [
    (8, 8, ((16, 16),)),
    (128, 16, ((32, 64),)),   # forces the narrow sub-tile backward
])
def test_msda_windowed_pp_grads_match_fallback(rng, D, window, shapes):
    """Per-point banded VJP vs the matmul fallback on the same per-point
    clamp transform. The D=128 config forces the backward's narrow
    sub-tile path (_tq_bwd < the row-budget-capped forward tile) with
    the per-point band indices repeated across sub-tiles."""
    from egtr_tpu.ops.msda_pallas import _tq_bwd
    from egtr_tpu.ops.msda_window import query_tile

    if D == 128:
        assert _tq_bwd(window * D) < query_tile(window, D, shapes[0][1])
    (h, w), = shapes
    value, shapes, loc, aw = make_inputs(
        rng, B=1, Q=h * w, H=2, D=D, shapes=shapes)

    def f(impl):
        def g(v, l, a):
            return ms_deform_attn(v, shapes, l, a, impl=impl,
                                  window=window, query_segments=shapes,
                                  band="point").sum()
        return jax.grad(g, argnums=(0, 1, 2))(
            jnp.array(value), jnp.array(loc), jnp.array(aw))

    gp, gm = f("pallas"), f("matmul")
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_msda_query_tile_row_budget():
    """query_tile caps the VMEM-fit tile so one tile's raster queries
    span at most win/4 rows (power-of-two multiples of 128)."""
    from egtr_tpu.ops.msda_window import fit_tile, query_tile

    assert query_tile(8, 32, 63) == 128        # 63*2=126 -> 128 floor
    assert query_tile(8, 32, 125) == 128       # 250 -> 128
    assert query_tile(16, 32, 125) == 256      # 500 -> 256
    assert query_tile(32, 32, 125) == 512      # 1000 -> 512 = VMEM cap
    assert query_tile(16, 32, 8) == 128        # floor at one lane tile
    for win, D, w in ((8, 32, 63), (16, 128, 125)):
        assert query_tile(win, D, w) <= fit_tile(win * D, 3)


def test_msda_windowed_narrow_level_small_window_is_exact(rng):
    """On a narrow level (w=64) a VMEM-sized 512-query tile spans 8
    raster rows — a window-8 band would be consumed by the tile's own
    query span and clamp even sub-pixel offsets. The row-budget tile cap
    (query_tile: span <= win/4 rows) shrinks the tile so small windows
    stay exact."""
    shapes = ((32, 64),)
    value, loc, aw = make_raster_inputs(rng, shapes, max_offset_px=0.5)
    exact = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                           jnp.array(aw), impl="pallas")
    for band in ("tile", "point"):
        win = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                             jnp.array(aw), impl="pallas", window=8,
                             query_segments=shapes, band=band)
        np.testing.assert_allclose(np.asarray(win), np.asarray(exact),
                                   atol=1e-5, rtol=1e-4)


def test_msda_windowed_out_of_image_is_zero(rng):
    # samples far outside the image must contribute exactly zero (the
    # clamp must not resurrect them)
    shapes = ((16, 16),)
    B, Q, H, D, P = 1, 256, 1, 8, 1
    value = rng.standard_normal((B, 256, H, D)).astype(np.float32)
    loc = np.full((B, Q, H, 1, P, 2), -5.0, np.float32)
    aw = np.ones((B, Q, H, 1, P), np.float32)
    for impl in ("pallas", "matmul"):
        out = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                             jnp.array(aw), impl=impl, window=8,
                             query_segments=shapes)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_msda_window_geq_height_is_exact(rng):
    # window >= every level height -> the exact kernel runs everywhere
    value, shapes, loc, aw = make_inputs(rng, B=1, Q=20, H=2, D=8,
                                         shapes=((6, 9), (3, 5)))
    exact = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                           jnp.array(aw), impl="pallas")
    win = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                         jnp.array(aw), impl="pallas", window=64,
                         query_segments=shapes)
    np.testing.assert_allclose(np.asarray(win), np.asarray(exact),
                               atol=1e-6, rtol=1e-5)


def test_msda_int8_exactly_representable_inputs(rng):
    # values are multiples of s with max = 127*s and sampling coords are
    # multiples of 1/127 pixel -> both quantizations are lossless, so the
    # int8 path must equal the exact kernel to f32 roundoff
    shapes = ((12, 10),)
    B, Q, H, D, P = 1, 6, 2, 8, 4
    s = 0.03125
    value = (rng.integers(-127, 128, (B, 120, H, D)) * s).astype(np.float32)
    value[0, 0, 0, 0] = 127 * s  # pin the max so the scale is exactly s
    k = rng.integers(0, 127 * 12, (B, Q, H, 1, P, 2)).astype(np.float32)
    # pixel coord = k/127 -> hat weights are multiples of 1/127
    loc = (k / 127.0 + 0.5) / np.array([10.0, 12.0], np.float32)
    aw = rng.uniform(0, 1, size=(B, Q, H, 1 * P)).astype(np.float32)
    aw = (aw / aw.sum(-1, keepdims=True)).reshape(B, Q, H, 1, P)

    exact = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                           jnp.array(aw), impl="pallas")
    q = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                       jnp.array(aw), impl="pallas", int8=True)
    np.testing.assert_allclose(np.asarray(q), np.asarray(exact),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("window", [0, 8])
def test_msda_int8_error_bound(rng, window):
    # random inputs: int8 quantization error stays small relative to the
    # output scale (values ~N(0,1) -> |v|max ~ 3, lsb ~ 3/127)
    shapes = ((16, 16), (8, 8))
    value, shapes, loc, aw = make_inputs(
        rng, B=2, Q=sum(h * w for h, w in shapes), H=2, D=8, shapes=shapes)
    kw = dict(window=window, query_segments=shapes if window else None)
    exact = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                           jnp.array(aw), impl="pallas", **kw)
    q = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                       jnp.array(aw), impl="pallas", int8=True, **kw)
    err = np.abs(np.asarray(q) - np.asarray(exact)).max()
    scale = np.abs(np.asarray(exact)).max()
    assert err < 0.05 * scale, (err, scale)


def test_msda_int8_grads_are_exact_path_grads(rng, monkeypatch):
    # straight-through: the int8 op's VJP must equal the exact kernel's
    # (force the pallas interpreter so int8=False doesn't fall back to
    # the matmul path, whose autodiff differs by roundoff)
    from egtr_tpu.ops import msda_pallas
    monkeypatch.setattr(msda_pallas, "INTERPRET", True)
    value, shapes, loc, aw = make_inputs(rng, B=1, Q=16, H=2, D=8,
                                         shapes=((6, 9), (3, 5)))

    def f(int8):
        def g(v, l, a):
            out = ms_deform_attn(v, shapes, l, a, impl="pallas", int8=int8)
            return (out * jnp.arange(out.size).reshape(out.shape)).sum()
        return jax.grad(g, argnums=(0, 1, 2))(
            jnp.array(value), jnp.array(loc), jnp.array(aw))

    gq = f(True)
    ge = f(False)
    for a, b in zip(gq, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_msda_pallas_under_mesh(rng, monkeypatch):
    """Under a data-parallel mesh the pallas path must run per-shard via
    shard_map (XLA cannot partition a custom call) and match the
    unsharded matmul result; windowed variant included."""
    from egtr_tpu.ops import msda_pallas as mp
    from egtr_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setattr(mp, "INTERPRET", True)

    shapes = ((8, 8), (4, 4))
    value, shapes, loc, aw = make_inputs(rng, B=4, Q=80, H=2, D=8,
                                         shapes=shapes)
    ref = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                         jnp.array(aw), impl="matmul")
    refw = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                          jnp.array(aw), impl="matmul", window=4,
                          query_segments=shapes)
    refp = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                          jnp.array(aw), impl="matmul", window=4,
                          query_segments=shapes, band="point")

    mesh = mesh_mod.make_mesh(dp=4, mp=2)
    prev = jax.sharding.get_mesh()
    jax.sharding.set_mesh(mesh)
    try:
        sh = mesh_mod.batch_sharding(mesh)
        v = jax.device_put(jnp.array(value), sh)
        l = jax.device_put(jnp.array(loc), sh)
        a = jax.device_put(jnp.array(aw), sh)
        out = jax.jit(lambda v, l, a: ms_deform_attn(
            v, shapes, l, a, impl="pallas"))(v, l, a)
        outw = jax.jit(lambda v, l, a: ms_deform_attn(
            v, shapes, l, a, impl="pallas", window=4,
            query_segments=shapes))(v, l, a)
        outp = jax.jit(lambda v, l, a: ms_deform_attn(
            v, shapes, l, a, impl="pallas", window=4,
            query_segments=shapes, band="point"))(v, l, a)
    finally:
        jax.sharding.set_mesh(prev)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(outw), np.asarray(refw),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(refp),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", IMPLS)
def test_msda_numeric_grad_vs_torch(rng, impl):
    """Backward parity: JAX autodiff vs torch autograd through the oracle."""
    value, shapes, loc, aw = make_inputs(rng, B=1, Q=2, H=2, D=4,
                                         shapes=((3, 4), (2, 2)))

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(aw).requires_grad_(True)
    import torch.nn.functional as F

    N, S, M, D = tv.shape
    _, Lq, _, L, P, _ = tl.shape
    value_list = tv.split([h * w for h, w in shapes], dim=1)
    grids = 2 * tl - 1
    svl = []
    for lid, (h, w) in enumerate(shapes):
        vl = value_list[lid].flatten(2).transpose(1, 2).reshape(N * M, D, h, w)
        gl = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        svl.append(F.grid_sample(vl, gl, mode="bilinear", padding_mode="zeros",
                                 align_corners=False))
    aww = ta.transpose(1, 2).reshape(N * M, 1, Lq, L * P)
    ref = ((torch.stack(svl, dim=-2).flatten(-2) * aww).sum(-1)
           .view(N, M * D, Lq).transpose(1, 2))
    ref.sum().backward()

    def f(v, l, a):
        return ms_deform_attn(v, shapes, l, a, impl=impl).sum()

    gv, gl_, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(aw)
    )
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), atol=1e-4)
    # location grads: grid_sample zero-pads -> gradient dies exactly at border
    # pixels; both implementations agree on interior points.
    np.testing.assert_allclose(np.asarray(gl_), tl.grad.numpy(), atol=1e-3)


def test_msda_windowed_banded_bwd_multitile(rng):
    # Multiple query tiles mapping to multiple bands: exercises the
    # band-sorted accumulation (argsort perm + first-flag init) of the
    # banded value-grad kernel, which single-tile tests never reach.
    shapes = ((80, 16),)                      # Q = 1280 -> 3 tiles (TQ=512)
    value, loc, aw = make_raster_inputs(rng, shapes, max_offset_px=1.5)

    def f(impl):
        def g(v, l, a):
            out = ms_deform_attn(v, shapes, l, a, impl=impl, window=8,
                                 query_segments=shapes)
            return (out * jnp.arange(out.size).reshape(out.shape)).sum()
        return jax.grad(g, argnums=(0, 1, 2))(
            jnp.array(value), jnp.array(loc), jnp.array(aw))

    gp = f("pallas")
    gm = f("matmul")
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_pallas_batched_p_forward_matches_p_loop():
    """The opt-in batched-P stage-1 dispatch (EGTR_MSDA_BATCH_P=1 — a
    measured NEGATIVE perf result, kept probe-able) must be numerically
    identical to the default p-loop forward: same dots, same f32
    accumulation per point."""
    from egtr_tpu.ops import msda_pallas as mp

    rng = np.random.default_rng(7)
    shapes = ((12, 20), (6, 10))
    S = sum(h * w for h, w in shapes)
    B, Q, H, D, L, P = 2, 40, 2, 8, 2, 4
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Q, H, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P)), jnp.float32)

    old = mp.FWD_BATCH_P
    try:
        mp.FWD_BATCH_P = False
        ref = np.asarray(mp.msda_pallas(value, shapes, loc, aw))
        mp.FWD_BATCH_P = True
        out = np.asarray(mp.msda_pallas(value, shapes, loc, aw))
    finally:
        mp.FWD_BATCH_P = old
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_band_geometry_is_half_band_aligned():
    """The Pallas banded kernels select band j as half-band blocks
    (j, j+1) of a free reshape, which requires every band start to be a
    multiple of the stride (win/2) and bands to cover [0, h)."""
    from egtr_tpu.ops.msda_window import band_starts, band_stride

    for h in (10, 16, 17, 75, 80, 100, 101):
        for win in (2, 4, 8, 16, 32):
            starts = band_starts(h, win)
            hb = band_stride(win)
            if h <= win:
                assert starts == (0,)
                continue
            assert all(s % hb == 0 for s in starts)
            assert starts == tuple(j * hb for j in range(len(starts)))
            # coverage: every row < h inside some band; overhang < stride
            assert starts[-1] + win >= h
            assert starts[-1] + win - h < hb
            # band j = half-band blocks (j, j+1) of the hgeo/hb split
            hgeo = starts[-1] + win
            assert hgeo % hb == 0
            assert len(starts) + 1 == hgeo // hb


def test_odd_window_rejected():
    """Odd windows cannot be expressed as two half-band blocks; both the
    op-level and config-level entry points must reject them."""
    import pytest

    from egtr_tpu.config import EgtrConfig

    shapes = ((8, 8),)
    v = jnp.zeros((1, 64, 1, 8))
    loc = jnp.full((1, 64, 1, 1, 1, 2), 0.5)
    aw = jnp.ones((1, 64, 1, 1, 1))
    with pytest.raises(ValueError, match="even window"):
        ms_deform_attn(v, shapes, loc, aw, impl="matmul", window=7,
                       query_segments=shapes)
    with pytest.raises(ValueError, match="msda_window"):
        EgtrConfig(msda_window=7)
    EgtrConfig(msda_window=16)  # valid
    with pytest.raises(ValueError, match="msda_band"):
        EgtrConfig(msda_band="query")
    EgtrConfig(msda_window=16, msda_band="point")  # valid
