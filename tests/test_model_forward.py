"""Smoke + shape tests for the full model forward on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egtr_tpu.config import EgtrConfig
from egtr_tpu.models.detr import DeformableDetrBase, level_shapes
from egtr_tpu.models.egtr import EgtrModel


TINY = EgtrConfig(
    d_model=64, encoder_layers=2, decoder_layers=2, encoder_ffn_dim=128,
    decoder_ffn_dim=128, encoder_attention_heads=8, decoder_attention_heads=8,
    num_queries=12, num_labels=7, num_rel_labels=5, num_feature_levels=4,
    dropout=0.0,
)


def test_level_shapes():
    assert level_shapes((600, 1000), 4) == ((75, 125), (38, 63), (19, 32), (10, 16))


@pytest.fixture(scope="module")
def base_forward():
    cfg = TINY
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 96, 3)), jnp.float32)
    mask = jnp.ones((1, 64, 96), bool)
    model = DeformableDetrBase(cfg)
    params = model.init(jax.random.PRNGKey(0), x, mask)
    out = model.apply(params, x, mask)
    return cfg, out


def test_base_shapes(base_forward):
    cfg, out = base_forward
    Q, C, L = cfg.num_queries, cfg.num_labels, cfg.decoder_layers
    H, Dh = cfg.decoder_attention_heads, cfg.head_dim
    assert out["logits"].shape == (1, Q, C)
    assert out["pred_boxes"].shape == (1, Q, 4)
    assert out["all_logits"].shape == (1, L, Q, C)
    assert out["attention_queries"].shape == (1, L, H, Q, Dh)
    assert out["attention_keys"].shape == (1, L, H, Q, Dh)
    assert out["last_hidden_state"].shape == (1, Q, cfg.d_model)
    for k, v in out.items():
        if v is None:  # enc_outputs_* are None in single-stage mode
            continue
        assert np.isfinite(np.asarray(v)).all(), f"non-finite in {k}"


def test_base_boxes_in_unit_range(base_forward):
    _, out = base_forward
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()


def test_egtr_forward_shapes():
    cfg = TINY
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 64, 96, 3)), jnp.float32)
    model = EgtrModel(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    Q, R = cfg.num_queries, cfg.num_rel_labels
    assert out["pred_rel"].shape == (1, Q, Q, R)
    assert out["pred_connectivity"].shape == (1, Q, Q, 1)
    assert out["rel_gate_mean"].shape == (cfg.decoder_layers + 1,)
    pr = np.asarray(out["pred_rel"])
    assert (pr >= 0).all() and (pr <= 1).all()
    assert np.isfinite(pr).all()


def test_padding_mask_changes_nothing_for_valid_region():
    """A padded batch must produce the same predictions for the real image
    content as an unpadded one (static-bucket padding invariance)."""
    cfg = TINY
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    model = DeformableDetrBase(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    out_a = model.apply(params, jnp.asarray(img),
                        jnp.ones((1, 64, 96), bool))
    # pad to 96x96 with garbage + mask
    padded = np.zeros((1, 96, 96, 3), np.float32)
    padded[:, :64, :96] = img
    padded[:, 64:] = 123.0
    mask = np.zeros((1, 96, 96), bool)
    mask[:, :64, :96] = True
    params_p = model.init(jax.random.PRNGKey(0), jnp.asarray(padded))
    out_b = model.apply(params_p, jnp.asarray(padded), jnp.asarray(mask))
    # predictions won't be bit-identical (conv padding effects at the
    # boundary + valid-ratio scaling), but should be close
    a = np.asarray(out_a["pred_boxes"])
    b = np.asarray(out_b["pred_boxes"])
    np.testing.assert_allclose(a, b, atol=0.15)


def test_stem_conv_space_to_depth_equivalence():
    """The space-to-depth stem must equal the plain 7x7/s2 conv (same MACs,
    reordered) — checked against lax.conv on even dims, plus the odd-dim
    fallback path."""
    import jax
    from jax import lax
    from egtr_tpu.models.backbone import StemConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)), jnp.float32)
    m = StemConv(64)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    ref = lax.conv_general_dilated(
        x, params["params"]["kernel"], window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert y.shape == ref.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # odd dims take the fallback and still match
    x_odd = x[:, :63, :95]
    y_odd = m.apply(params, x_odd)
    ref_odd = lax.conv_general_dilated(
        x_odd, params["params"]["kernel"], window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y_odd), np.asarray(ref_odd),
                               atol=1e-5, rtol=1e-5)


def test_dilation_c5_subsample_exactness():
    """dilation=True (timm output_stride=16, deformable_detr.py:144,751)
    must equal the strided backbone on the common grid: a stride-2 conv is
    a stride-1 conv subsampled at even positions, and dilation-2 taps on
    the fine grid read exactly the coarse grid's dilation-1 taps (the
    'a trous' identity) — so C5_dilated[::2, ::2] == C5_strided, exactly,
    on the SAME params (checkpoints convert 1:1 between the two modes)."""
    from egtr_tpu.models.backbone import ResNet50

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    strided = ResNet50()
    dilated = ResNet50(dilation=True)
    params = strided.init(jax.random.PRNGKey(0), x)
    # same param tree either way (dilation only re-routes the convs)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(dilated.init(jax.random.PRNGKey(0), x))
    c3s, c4s, c5s = strided.apply(params, x)
    c3d, c4d, c5d = dilated.apply(params, x)
    assert c5d.shape[1:3] == c4d.shape[1:3]  # stride 16, not 32
    np.testing.assert_array_equal(np.asarray(c3s), np.asarray(c3d))
    np.testing.assert_array_equal(np.asarray(c4s), np.asarray(c4d))
    np.testing.assert_allclose(np.asarray(c5d[:, ::2, ::2]),
                               np.asarray(c5s), atol=1e-5, rtol=1e-5)


def test_dilation_full_model_forward():
    cfg = TINY.replace(dilation=True)
    assert level_shapes((600, 1000), 4, dilation=True) == (
        (75, 125), (38, 63), (38, 63), (19, 32))
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 64, 96, 3)), jnp.float32)
    model = EgtrModel(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert np.isfinite(np.asarray(out["pred_rel"])).all()


def test_activation_function_gelu():
    """activation_function wires into the FFNs (reference ACT2FN,
    deformable_detr.py:1297,1396); 'gelu' must be torch's exact erf form,
    not flax's default tanh approximation."""
    from scipy.special import erf
    from egtr_tpu.models.layers import ACT_FN

    x = np.linspace(-4, 4, 101, dtype=np.float32)
    expect = 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))
    np.testing.assert_allclose(np.asarray(ACT_FN["gelu"](jnp.asarray(x))),
                               expect, atol=1e-6)

    img = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 64, 96, 3)), jnp.float32)
    out_r = EgtrModel(TINY).apply(
        EgtrModel(TINY).init(jax.random.PRNGKey(0), img), img)
    cfg_g = TINY.replace(activation_function="gelu")
    out_g = EgtrModel(cfg_g).apply(
        EgtrModel(cfg_g).init(jax.random.PRNGKey(0), img), img)
    assert np.abs(np.asarray(out_r["logits"])
                  - np.asarray(out_g["logits"])).max() > 1e-4
    assert np.isfinite(np.asarray(out_g["pred_rel"])).all()


def test_activation_function_validated():
    with pytest.raises(ValueError, match="activation_function"):
        TINY.replace(activation_function="tanh")


def test_backbone_validated_and_resnet101_runs():
    """config.backbone selects the trunk depth (reference supports any
    timm name, deformable_detr.py:748-756; here the frozen-BN ResNet
    family) and unknown names fail loudly instead of silently running
    resnet50."""
    with pytest.raises(ValueError, match="backbone"):
        TINY.replace(backbone="resnet18")

    cfg = TINY.replace(backbone="resnet101")
    assert cfg.backbone_blocks == (3, 4, 23, 3)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 64, 96, 3)), jnp.float32)
    model = EgtrModel(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    # depth shows up in the param tree: layer3 has 23 blocks
    bb = params["params"]["model"]["backbone"]
    assert "layer3_22" in bb and "layer3_6" not in EgtrModel(TINY).init(
        jax.random.PRNGKey(0), x)["params"]["model"]["backbone"]
    out = model.apply(params, x)
    assert np.isfinite(np.asarray(out["pred_rel"])).all()
