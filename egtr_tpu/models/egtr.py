"""EGTR scene-graph-generation model (flax.linen).

TPU-native re-design of ``DetrForSceneGraphGeneration``
(model/egtr.py:122-540). The detection path is the shared
:class:`~egtr_tpu.models.detr.DeformableDetrBase`; this module adds the
relation-extraction head that harvests the decoder self-attention (q, k)
by-products.

Memory re-design (exact same numerics as the reference, no approximation):
the reference materializes ``relation_source`` of shape
[B, Q, Q, L+1, 2·d] (~573 MB/img fp32, egtr.py:366-397). But the gate
(egtr.py:399-402) is ``sigmoid(w_g · [q_i; k_j])`` — *rank-1 over (i, j)* —
and the first layer of both 3-layer MLP heads is linear in ``[gq; gk]``.
So with

    ga[i,l] = q_l(i)·w_g[:d],    gb[j,l] = k_l(j)·w_g[d:]
    gate[i,j,l] = sigmoid(ga[i,l] + gb[j,l] + b_g)
    Aq[i,l] = W1a q_l(i),        Bk[j,l] = W1b k_l(j)

the first hidden layer of the relation MLP is exactly

    h1[i,j] = sum_l gate[i,j,l] (Aq[i,l] + Bk[j,l]) + b1,

two [Q,Q,L+1] x [Q,L+1,d] contractions on the MXU, and the biggest live
tensor is [B, Q, Q, d] (~41 MB/img) — a 14x reduction with bit-identical
math (modulo float reassociation).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EgtrConfig
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, maybe_constraint
from .detr import DeformableDetrBase
from .layers import dense, default_kernel_init

# the Q^2 pairwise grid shards its subject axis over the model axis — the
# sequence-parallel analog for this architecture (SURVEY.md §5)
_PAIR_SPEC = jax.sharding.PartitionSpec(DATA_AXIS, MODEL_AXIS)


def compute_freq_dists(fg_matrix, eps: float, use_log_softmax: bool):
    """Frequency-bias buffers from the train-set triplet counts.

    Reference: egtr.py:169-194. NOTE the reference expression
    ``fg_matrix + eps / (fg_matrix.sum(2, keepdims=True) + eps)`` adds
    ``eps/(sum+eps)`` to the raw counts (python operator precedence) — we
    reproduce it verbatim since released checkpoints bake it in.
    Returns (rel_dist [R], triplet_dist [C+1, C+1, R]).
    """
    fg = jnp.asarray(fg_matrix, jnp.float32)
    rel_dist = fg.sum(axis=(0, 1)) / (fg.sum() + eps)
    triplet = fg + eps / (fg.sum(axis=2, keepdims=True) + eps)
    if use_log_softmax:
        triplet_dist = jax.nn.log_softmax(triplet, axis=-1)
    else:
        triplet_dist = jnp.log(triplet)
    return rel_dist, triplet_dist


class EgtrHead(nn.Module):
    """Relation + connectivity head over decoder (q, k) by-products."""

    config: EgtrConfig

    @nn.compact
    def __call__(self, attention_queries, attention_keys, last_hidden_state,
                 logits, triplet_dist=None):
        """
        attention_queries/keys: [B, L, H, Q, Dh] stacked per decoder layer
        last_hidden_state:      [B, Q, E]
        logits:                 [B, Q, C] final classification logits
        triplet_dist:           [C+1, C+1, R] log-frequency bias (or None)

        Returns dict(pred_rel_logits, pred_connectivity_logits, rel_gate_mean).
        """
        cfg = self.config
        E = cfg.d_model
        dtype = jnp.dtype(cfg.compute_dtype)
        L = cfg.decoder_layers
        R = cfg.num_rel_labels
        B, _, H, Q, Dh = attention_queries.shape
        unscaling = cfg.head_dim ** 0.5

        # [B,L,H,Q,Dh] -> [B,L,Q,E] (the reference's transpose(1,2).reshape)
        def merge_heads(t):
            return t.transpose(0, 1, 3, 2, 4).reshape(B, L, Q, E)

        qs_raw = merge_heads(attention_queries) * unscaling
        ks_raw = merge_heads(attention_keys)

        # per-layer projections (egtr.py:196-207) + final sub/obj projections
        qs = [dense(E, f"proj_q_{l}", dtype=dtype)(qs_raw[:, l])
              for l in range(L)]
        ks = [dense(E, f"proj_k_{l}", dtype=dtype)(ks_raw[:, l])
              for l in range(L)]
        qs.append(dense(E, "final_sub_proj", dtype=dtype)(last_hidden_state))
        ks.append(dense(E, "final_obj_proj", dtype=dtype)(last_hidden_state))
        Qs = jnp.stack(qs, axis=2)  # [B, Q, L+1, E]
        Ks = jnp.stack(ks, axis=2)  # [B, Q, L+1, E]

        # gate parameters (rel_predictor_gate: Dense(2E -> 1), egtr.py:211)
        wg = self.param("rel_predictor_gate_kernel", default_kernel_init,
                        (2 * E, 1))
        bg = self.param("rel_predictor_gate_bias", nn.initializers.zeros, (1,))
        ga = jnp.einsum("bqle,eo->bqlo", Qs, wg[:E].astype(Qs.dtype),
                        preferred_element_type=jnp.float32)[..., 0]
        gb = jnp.einsum("bqle,eo->bqlo", Ks, wg[E:].astype(Ks.dtype),
                        preferred_element_type=jnp.float32)[..., 0]
        gate = jax.nn.sigmoid(
            ga[:, :, None, :] + gb[:, None, :, :] + bg[0])     # [B,Q,Q,L+1]
        gate = maybe_constraint(gate, _PAIR_SPEC)
        gate_c = gate.astype(dtype)

        # first MLP layer of rel_predictor, factorized (see module docstring)
        w1 = self.param("rel_predictor_layers_0_kernel", default_kernel_init,
                        (2 * E, E))
        b1 = self.param("rel_predictor_layers_0_bias", nn.initializers.zeros,
                        (E,))
        Aq = jnp.einsum("bile,ed->bild", Qs, w1[:E].astype(Qs.dtype))
        Bk = jnp.einsum("bjle,ed->bjld", Ks, w1[E:].astype(Ks.dtype))
        h1 = (jnp.einsum("bijl,bild->bijd", gate_c, Aq.astype(dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bijl,bjld->bijd", gate_c, Bk.astype(dtype),
                           preferred_element_type=jnp.float32) + b1)
        h1 = maybe_constraint(h1.astype(dtype), _PAIR_SPEC)
        h = nn.relu(h1)
        h = nn.relu(dense(E, "rel_predictor_layers_1", dtype=dtype)(h))
        pred_rel = dense(R, "rel_predictor_layers_2",
                         dtype=dtype)(h).astype(jnp.float32)    # [B,Q,Q,R]

        # frequency bias (Neural Motifs; egtr.py:405-413)
        if cfg.use_freq_bias and triplet_dist is not None:
            node = jnp.argmax(logits, axis=-1)  # [B,Q]
            bias = triplet_dist[node[:, :, None], node[:, None, :]]  # [B,Q,Q,R]
            pred_rel = pred_rel + bias

        # connectivity head shares the gated source (egtr.py:218-223,416)
        c1w = self.param("connectivity_layers_0_kernel", default_kernel_init,
                         (2 * E, E))
        c1b = self.param("connectivity_layers_0_bias", nn.initializers.zeros,
                         (E,))
        Cq = jnp.einsum("bile,ed->bild", Qs, c1w[:E].astype(Qs.dtype))
        Ck = jnp.einsum("bjle,ed->bjld", Ks, c1w[E:].astype(Ks.dtype))
        c1 = (jnp.einsum("bijl,bild->bijd", gate_c, Cq.astype(dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bijl,bjld->bijd", gate_c, Ck.astype(dtype),
                           preferred_element_type=jnp.float32) + c1b)
        c = nn.relu(c1.astype(dtype))
        c = nn.relu(dense(E, "connectivity_layers_1", dtype=dtype)(c))
        pred_connectivity = dense(1, "connectivity_layers_2",
                                  dtype=dtype)(c).astype(jnp.float32)

        rel_gate_mean = gate.mean(axis=(0, 1, 2))  # [L+1] for logging

        return {
            "pred_rel_logits": pred_rel,
            "pred_connectivity_logits": pred_connectivity,
            "rel_gate_mean": rel_gate_mean,
        }


class EgtrModel(nn.Module):
    """Full EGTR: Deformable-DETR base + relation head.

    Inference outputs mirror DetrSceneGraphGenerationOutput (egtr.py:53-119):
    sigmoid-activated pred_rel / pred_connectivity, plus raw logits/boxes and
    everything the loss needs.
    """

    config: EgtrConfig

    @nn.compact
    def __call__(self, pixel_values, pixel_mask=None, deterministic: bool = True):
        cfg = self.config
        base_out = DeformableDetrBase(cfg, name="model")(
            pixel_values, pixel_mask, deterministic=deterministic)

        # frequency-bias buffers: non-trainable params, loaded from fg_matrix
        # at init (egtr.py:169-194)
        R, C = cfg.num_rel_labels, cfg.num_labels
        rel_dist = self.param("rel_dist", nn.initializers.zeros, (R,))
        triplet_dist = self.param(
            "triplet_dist", nn.initializers.zeros, (C + 1, C + 1, R))

        head_out = EgtrHead(cfg, name="relation_head")(
            base_out["attention_queries"], base_out["attention_keys"],
            base_out["last_hidden_state"], base_out["logits"],
            triplet_dist=triplet_dist if cfg.use_freq_bias else None)

        pred_rel_logits = head_out["pred_rel_logits"]
        if cfg.logit_adjustment:
            # post-hoc logit adjustment (egtr.py:507-512)
            pred_rel_logits = pred_rel_logits - cfg.logit_adj_tau * jnp.log(
                rel_dist)

        return {
            **base_out,
            "pred_rel_logits": head_out["pred_rel_logits"],
            "pred_connectivity_logits": head_out["pred_connectivity_logits"],
            "pred_rel": jax.nn.sigmoid(pred_rel_logits),
            "pred_connectivity": jax.nn.sigmoid(
                head_out["pred_connectivity_logits"]),
            "rel_gate_mean": head_out["rel_gate_mean"],
        }
