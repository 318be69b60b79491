"""Fast-path equivalence tests: no-mask inference path and bf16 sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from egtr_tpu.config import EgtrConfig
from egtr_tpu.models.detr import DeformableDetrBase
from egtr_tpu.ops.posenc import (sine_position_embedding,
                                 sine_position_embedding_full)

TINY = EgtrConfig(
    d_model=64, encoder_layers=2, decoder_layers=2, encoder_ffn_dim=128,
    decoder_ffn_dim=128, num_queries=12, num_labels=7, num_rel_labels=5,
    dropout=0.0)


def test_posenc_full_equals_masked():
    h, w = 19, 32
    full = sine_position_embedding_full((h, w), 32)
    masked = sine_position_embedding(jnp.ones((1, h, w), bool), 32)
    np.testing.assert_allclose(np.asarray(full), np.asarray(masked),
                               atol=1e-6)


def test_no_mask_path_equals_full_mask():
    """pixel_mask=None (fast path) must equal an all-True mask bit-for-bit
    in the things that matter (logits, boxes, q/k states)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    model = DeformableDetrBase(TINY)
    params = model.init(jax.random.PRNGKey(0), x)
    out_none = model.apply(params, x, None)
    out_full = model.apply(params, x, jnp.ones((1, 64, 96), bool))
    for key in ("logits", "pred_boxes", "attention_queries",
                "attention_keys", "last_hidden_state"):
        np.testing.assert_allclose(
            np.asarray(out_none[key]), np.asarray(out_full[key]),
            atol=2e-5, err_msg=key)


def test_bf16_close_to_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    m32 = DeformableDetrBase(TINY)
    m16 = DeformableDetrBase(TINY.replace(compute_dtype="bfloat16"))
    params = m32.init(jax.random.PRNGKey(0), x)
    o32 = m32.apply(params, x)
    o16 = m16.apply(params, x)
    # boxes are bounded in [0,1]; bf16 drift should be small
    err = np.abs(np.asarray(o32["pred_boxes"])
                 - np.asarray(o16["pred_boxes"])).max()
    assert err < 0.05, err
    # logits drift bounded relative to their scale
    l32 = np.asarray(o32["logits"])
    l16 = np.asarray(o16["logits"])
    assert np.abs(l32 - l16).max() < 0.25 * (np.abs(l32).max() + 1)
