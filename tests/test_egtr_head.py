"""The factorized relation head must match the reference's naive math.

Oracle: direct materialization of relation_source [Q,Q,L+1,2E] and the gated
sum, exactly as egtr.py:335-417, computed with the same parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp

from egtr_tpu.config import EgtrConfig
from egtr_tpu.models.egtr import EgtrHead


def naive_head(params, cfg, aq, ak, hidden, logits, triplet_dist):
    """Reference-math oracle (materializes the full pairwise tensor)."""
    p = params["params"]
    E, L = cfg.d_model, cfg.decoder_layers
    B, _, H, Q, Dh = aq.shape
    unscale = cfg.head_dim ** 0.5

    def merge(t):
        return np.transpose(t, (0, 1, 3, 2, 4)).reshape(B, L, Q, E)

    qs_raw = merge(np.asarray(aq)) * unscale
    ks_raw = merge(np.asarray(ak))

    def densely(name, x):
        return x @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])

    Qs = np.stack(
        [densely(f"proj_q_{l}", qs_raw[:, l]) for l in range(L)]
        + [densely("final_sub_proj", np.asarray(hidden))], axis=2)
    Ks = np.stack(
        [densely(f"proj_k_{l}", ks_raw[:, l]) for l in range(L)]
        + [densely("final_obj_proj", np.asarray(hidden))], axis=2)

    # relation_source [B,Q,Q,L+1,2E]
    rs = np.concatenate(
        [np.broadcast_to(Qs[:, :, None], (B, Q, Q, L + 1, E)),
         np.broadcast_to(Ks[:, None, :], (B, Q, Q, L + 1, E))], axis=-1)
    wg = np.asarray(p["rel_predictor_gate_kernel"])
    bg = np.asarray(p["rel_predictor_gate_bias"])
    gate = 1 / (1 + np.exp(-(rs @ wg + bg)))           # [B,Q,Q,L+1,1]
    gated = (gate * rs).sum(axis=-2)                    # [B,Q,Q,2E]

    w1 = np.asarray(p["rel_predictor_layers_0_kernel"])
    b1 = np.asarray(p["rel_predictor_layers_0_bias"])
    h = np.maximum(gated @ w1 + b1, 0)
    h = np.maximum(densely("rel_predictor_layers_1", h), 0)
    pred_rel = densely("rel_predictor_layers_2", h)

    node = np.argmax(np.asarray(logits), axis=-1)
    for b in range(B):
        pred_rel[b] += np.asarray(triplet_dist)[node[b]][:, node[b]]

    c1w = np.asarray(p["connectivity_layers_0_kernel"])
    c1b = np.asarray(p["connectivity_layers_0_bias"])
    c = np.maximum(gated @ c1w + c1b, 0)
    c = np.maximum(densely("connectivity_layers_1", c), 0)
    pred_conn = densely("connectivity_layers_2", c)
    return pred_rel, pred_conn, gate[..., 0].mean(axis=(0, 1, 2))


def test_factorized_head_matches_naive(rng):
    cfg = EgtrConfig(d_model=32, decoder_layers=3, decoder_attention_heads=4,
                     num_queries=13, num_labels=7, num_rel_labels=5)
    B, L, H, Q = 2, 3, 4, 13
    Dh = cfg.d_model // H
    aq = rng.standard_normal((B, L, H, Q, Dh)).astype(np.float32)
    ak = rng.standard_normal((B, L, H, Q, Dh)).astype(np.float32)
    hidden = rng.standard_normal((B, Q, cfg.d_model)).astype(np.float32)
    logits = rng.standard_normal((B, Q, cfg.num_labels)).astype(np.float32)
    triplet = rng.standard_normal(
        (cfg.num_labels + 1, cfg.num_labels + 1, cfg.num_rel_labels)
    ).astype(np.float32)

    head = EgtrHead(cfg)
    params = head.init(jax.random.PRNGKey(0), jnp.array(aq), jnp.array(ak),
                       jnp.array(hidden), jnp.array(logits),
                       triplet_dist=jnp.array(triplet))
    out = head.apply(params, jnp.array(aq), jnp.array(ak), jnp.array(hidden),
                     jnp.array(logits), triplet_dist=jnp.array(triplet))

    ref_rel, ref_conn, ref_gate = naive_head(
        params, cfg, aq, ak, hidden, logits, triplet)

    np.testing.assert_allclose(
        np.asarray(out["pred_rel_logits"]), ref_rel, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["pred_connectivity_logits"]), ref_conn, atol=2e-4,
        rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["rel_gate_mean"]), ref_gate, atol=1e-5)
