"""Deformable-DETR base model (flax.linen, NHWC, static shapes).

TPU-native re-design of the reference ``DeformableDetrModel``
(model/deformable_detr.py:1978-2390) plus the detection heads of
``DeformableDetrForObjectDetection`` (:2400-2553). Differences from the
reference that are deliberate TPU design choices:

- images are padded to static bucket shapes, so every level's spatial shape
  is a compile-time constant — level flattening, reference grids and the
  deformable-attention gather layout are all static;
- the decoder loop is unrolled (6 layers) and per-layer (hidden, q, k, ref)
  are stacked as first-class outputs — no output-plumbing "hack";
- iterative box refinement uses ``jax.lax.stop_gradient`` for the
  ``.detach()`` at deformable_detr.py:1918;
- everything runs in one ``jit`` program; no host sync anywhere.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EgtrConfig
from ..ops.boxes import inverse_sigmoid
from ..ops.posenc import sine_position_embedding, sine_position_embedding_full
from .backbone import ResNet50
from .layers import (DecoderLayer, EncoderLayer, MLPHead,
                     default_kernel_init)


def level_shapes(image_hw: Tuple[int, int], num_levels: int,
                 dilation: bool = False) -> Tuple[Tuple[int, int], ...]:
    """Static per-level (h, w) for a padded image shape.

    Matches conv stride arithmetic: C3..C5 are ceil(H/8,16,32); the extra
    level is a stride-2 3x3 conv on C5 -> ceil(C5/2). With ``dilation``
    (timm output_stride=16) C5 stays at stride 16.
    """
    H, W = image_hw
    shapes = []
    for s in (8, 16, 16 if dilation else 32):
        shapes.append((math.ceil(H / s), math.ceil(W / s)))
    while len(shapes) < num_levels:
        h, w = shapes[-1]
        shapes.append((math.ceil(h / 2), math.ceil(w / 2)))
    return tuple(shapes[:num_levels])


def _resize_mask(mask, hw: Tuple[int, int]):
    """Downsample a [B,H,W] bool mask to a level resolution with torch's
    legacy 'nearest' semantics (src = floor(dst * in/out)) — exactly what
    the reference's F.interpolate does to pixel_mask
    (deformable_detr.py:783-786). jax.image.resize's 'nearest' samples at
    pixel centers instead, which disagrees on boundary rows of padded
    batches."""
    B, H, W = mask.shape
    oh, ow = hw
    ri = (jnp.arange(oh) * H) // oh
    ci = (jnp.arange(ow) * W) // ow
    return mask[:, ri][:, :, ci]


def encoder_reference_points(spatial_shapes, valid_ratios):
    """Per-level normalized reference grid for the encoder.

    Reference: DeformableDetrEncoder.get_reference_points
    (deformable_detr.py:1615-1648). Returns [B, S, L, 2].
    """
    ref_list = []
    for (h, w) in spatial_shapes:
        ref_y, ref_x = jnp.meshgrid(
            jnp.linspace(0.5, h - 0.5, h, dtype=jnp.float32),
            jnp.linspace(0.5, w - 0.5, w, dtype=jnp.float32),
            indexing="ij",
        )
        ref_list.append(jnp.stack([ref_x.reshape(-1), ref_y.reshape(-1)], -1))
    # normalize per level by valid_ratio * size
    refs = []
    for lid, (h, w) in enumerate(spatial_shapes):
        r = ref_list[lid][None]  # [1, h*w, 2]
        denom = valid_ratios[:, None, lid, :] * jnp.asarray(
            [w, h], jnp.float32)  # [B,1,2]
        refs.append(r / denom)
    ref = jnp.concatenate(refs, axis=1)  # [B, S, 2]
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]  # [B,S,L,2]


class DeformableDetrBase(nn.Module):
    """Backbone -> multi-scale encoder -> query decoder with per-layer heads.

    Returns a dict with per-layer class logits / boxes, stacked decoder
    (q, k) attention states, and the final hidden state — everything the
    detection wrapper and the EGTR relation head need.
    """

    config: EgtrConfig

    @nn.compact
    def __call__(self, pixel_values, pixel_mask=None, deterministic: bool = True):
        cfg = self.config
        E = cfg.d_model
        dtype = jnp.dtype(cfg.compute_dtype)
        Lv = cfg.num_feature_levels
        B, H_img, W_img, _ = pixel_values.shape
        # mask-free fast path: batch-1 inference on unpadded buckets skips
        # value masking, mask cumsums and valid-ratio arithmetic entirely
        no_mask = pixel_mask is None

        # ---- backbone (C3, C4, C5) ----
        feats = ResNet50(blocks=cfg.backbone_blocks, dtype=dtype,
                         dilation=cfg.dilation,
                         name="backbone")(pixel_values)

        shapes = level_shapes((H_img, W_img), Lv, cfg.dilation)
        if cfg.position_embedding_type == "learned":
            # 50x50 learned table (deformable_detr.py:880-906)
            learned_rows = self.param(
                "row_embeddings", nn.initializers.uniform(1.0), (50, E // 2))
            learned_cols = self.param(
                "column_embeddings", nn.initializers.uniform(1.0),
                (50, E // 2))
        sources, masks, pos_embeds = [], [], []
        for lvl in range(Lv):
            if lvl < len(feats):
                x = feats[lvl]
                src = nn.Conv(E, (1, 1), use_bias=True, dtype=dtype,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name=f"input_proj_{lvl}_conv")(x)
            else:
                # extra level: stride-2 3x3 conv on C5 (deformable_detr.py:1999-2009)
                x = feats[-1] if lvl == len(feats) else sources[-1]
                src = nn.Conv(E, (3, 3), strides=(2, 2), dtype=dtype,
                              padding=[(1, 1), (1, 1)], use_bias=True,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name=f"input_proj_{lvl}_conv")(x)
            src = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                               dtype=jnp.float32,
                               name=f"input_proj_{lvl}_norm")(src)
            src = src.astype(dtype)
            assert src.shape[1:3] == shapes[lvl], (
                f"level {lvl}: conv shape {src.shape[1:3]} != static {shapes[lvl]}")
            if cfg.position_embedding_type == "learned":
                hh, ww = shapes[lvl]
                y_emb = learned_rows[jnp.clip(jnp.arange(hh), 0, 49)]
                x_emb = learned_cols[jnp.clip(jnp.arange(ww), 0, 49)]
                pe = jnp.broadcast_to(jnp.concatenate([
                    jnp.broadcast_to(x_emb[None, :, :], (hh, ww, E // 2)),
                    jnp.broadcast_to(y_emb[:, None, :], (hh, ww, E // 2)),
                ], axis=-1)[None], (B, hh, ww, E))
                m = None if no_mask else _resize_mask(pixel_mask, shapes[lvl])
            elif no_mask:
                m = None
                pe = jnp.broadcast_to(
                    sine_position_embedding_full(shapes[lvl], E // 2),
                    (B,) + shapes[lvl] + (E,))
            else:
                m = _resize_mask(pixel_mask, shapes[lvl])
                pe = sine_position_embedding(m, E // 2)
            sources.append(src)
            masks.append(m)
            pos_embeds.append(pe)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(stddev=1.0), (Lv, E))

        source_flatten = jnp.concatenate(
            [s.reshape(B, -1, E) for s in sources], axis=1)      # [B,S,E]
        mask_flatten = None if no_mask else jnp.concatenate(
            [m.reshape(B, -1) for m in masks], axis=1)           # [B,S]
        pos_flatten = jnp.concatenate(
            [p.reshape(B, -1, E) + level_embed[l][None, None]
             for l, p in enumerate(pos_embeds)], axis=1).astype(dtype)

        # valid ratios (deformable_detr.py:2065-2074)
        if no_mask:
            valid_ratios = jnp.ones((B, Lv, 2), jnp.float32)
        else:
            vr = []
            for m in masks:
                valid_h = m[:, :, 0].sum(axis=1).astype(jnp.float32)
                valid_w = m[:, 0, :].sum(axis=1).astype(jnp.float32)
                vr.append(jnp.stack(
                    [valid_w / m.shape[2], valid_h / m.shape[1]], axis=-1))
            valid_ratios = jnp.stack(vr, axis=1)                 # [B,L,2]

        # ---- encoder ----
        enc_ref = encoder_reference_points(shapes, valid_ratios)
        hidden = nn.Dropout(cfg.dropout)(source_flatten, deterministic)
        # rematerialized layers recompute the MSDA gathers in backward
        # instead of saving ~GB of patch activations (jax.checkpoint)
        # deterministic must be a STATIC positional under jax.checkpoint
        remat_kw = {}
        if cfg.use_remat and cfg.remat_policy == "dots":
            # save MXU outputs + the tagged MSDA kernel output; recompute
            # only elementwise chains (norms, activations, residual adds)
            remat_kw["policy"] = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("msda"))
        EncLayer = nn.remat(EncoderLayer, static_argnums=(4, 6), **remat_kw) \
            if cfg.use_remat else EncoderLayer
        DecLayer = nn.remat(DecoderLayer, static_argnums=(5, 7), **remat_kw) \
            if cfg.use_remat else DecoderLayer
        for i in range(cfg.encoder_layers):
            hidden = EncLayer(
                E, cfg.encoder_ffn_dim, cfg.encoder_attention_heads, Lv,
                cfg.encoder_n_points, cfg.dropout, cfg.activation_dropout,
                cfg.activation_function,
                dtype=dtype, msda_impl=cfg.msda_impl,
                msda_window=cfg.msda_window, msda_band=cfg.msda_band,
                msda_int8=cfg.msda_int8,
                name=f"encoder_layer_{i}",
            )(hidden, pos_flatten, enc_ref, shapes, mask_flatten,
              deterministic)
        encoder_hidden = hidden

        # ---- detection heads (shared or per-layer clones); two-stage adds
        #      one extra head for proposal scoring (egtr.py:140-161) ----
        num_pred = cfg.decoder_layers + 1 if cfg.two_stage else \
            cfg.decoder_layers
        prior = 0.01
        cls_bias = float(-math.log((1 - prior) / prior))
        box_bias = (0.0, 0.0, 0.0, 0.0) if cfg.two_stage else \
            (0.0, 0.0, -2.0, -2.0)

        def make_heads(idx):
            cls = nn.Dense(
                cfg.num_labels, kernel_init=default_kernel_init,
                bias_init=nn.initializers.constant(cls_bias),
                dtype=jnp.float32, name=f"class_embed_{idx}")
            box = MLPHead(E, 4, 3, final_kernel_zero=True,
                          final_bias=box_bias,
                          dtype=jnp.float32, name=f"bbox_embed_{idx}")
            return cls, box

        if cfg.with_box_refine or cfg.two_stage:
            heads = [make_heads(i) for i in range(num_pred)]
        else:
            shared = make_heads(0)
            heads = [shared] * num_pred

        # ---- query init ----
        enc_outputs_class = None
        enc_outputs_coord_logits = None
        if cfg.two_stage:
            # proposal generation from encoder memory
            # (deformable_detr.py:2098-2159, 2306-2337)
            object_query, output_proposals = _gen_encoder_output_proposals(
                encoder_hidden.astype(jnp.float32), mask_flatten, shapes)
            object_query = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")(
                nn.Dense(E, kernel_init=default_kernel_init,
                         name="enc_output")(object_query))
            enc_outputs_class = heads[-1][0](object_query)
            enc_outputs_coord_logits = heads[-1][1](object_query) \
                + output_proposals

            topk = cfg.two_stage_num_proposals
            _, topk_idx = jax.lax.top_k(enc_outputs_class[..., 0], topk)
            topk_coords_logits = jnp.take_along_axis(
                enc_outputs_coord_logits, topk_idx[..., None], axis=1)
            topk_coords_logits = jax.lax.stop_gradient(topk_coords_logits)
            reference_points = jax.nn.sigmoid(topk_coords_logits)  # [B,k,4]
            init_reference = reference_points
            pos_trans = nn.Dense(2 * E, kernel_init=default_kernel_init,
                                 name="pos_trans")(
                _proposal_pos_embed(topk_coords_logits, E // 2))
            pos_trans = nn.LayerNorm(epsilon=1e-5, name="pos_trans_norm")(pos_trans)
            query_pos, target = jnp.split(pos_trans, 2, axis=2)
        else:
            query_embeddings = self.param(
                "query_position_embeddings", default_kernel_init,
                (cfg.num_queries, 2 * E))
            query_pos, target = jnp.split(query_embeddings, 2, axis=1)
            query_pos = jnp.broadcast_to(query_pos[None],
                                         (B, cfg.num_queries, E))
            target = jnp.broadcast_to(target[None], (B, cfg.num_queries, E))
            reference_points = jax.nn.sigmoid(
                nn.Dense(2, kernel_init=nn.initializers.xavier_uniform(),
                         dtype=jnp.float32,
                         name="reference_points")(query_pos))
            init_reference = reference_points
        query_pos = query_pos.astype(dtype)
        target = target.astype(dtype)

        # ---- decoder (unrolled; deformable_detr.py:1853-1939) ----
        hidden = target
        inter_hidden, inter_refs, attn_qs, attn_ks = [], [], [], []
        for i in range(cfg.decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = reference_points[:, :, None] * jnp.concatenate(
                    [valid_ratios, valid_ratios], -1)[:, None]
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]
            hidden, q, k = DecLayer(
                E, cfg.decoder_ffn_dim, cfg.decoder_attention_heads, Lv,
                cfg.decoder_n_points, cfg.dropout, cfg.attention_dropout,
                cfg.activation_dropout, cfg.activation_function, dtype=dtype,
                msda_impl=cfg.msda_impl, msda_int8=cfg.msda_int8,
                name=f"decoder_layer_{i}",
            )(hidden, query_pos, encoder_hidden, ref_input, shapes,
              mask_flatten, deterministic)

            if cfg.with_box_refine:
                delta = heads[i][1](hidden)
                if reference_points.shape[-1] == 2:
                    # refs become 4-dim after the first refinement
                    # (deformable_detr.py:1908-1917)
                    new_ref = delta.at[..., :2].add(
                        inverse_sigmoid(reference_points))
                else:
                    new_ref = delta + inverse_sigmoid(reference_points)
                reference_points = jax.lax.stop_gradient(
                    jax.nn.sigmoid(new_ref))
            inter_hidden.append(hidden)
            inter_refs.append(reference_points)
            attn_qs.append(q)
            attn_ks.append(k)

        # ---- per-layer class/box outputs (egtr.py:286-314) ----
        outputs_classes, outputs_coords = [], []
        for lvl in range(cfg.decoder_layers):
            ref = init_reference if lvl == 0 else inter_refs[lvl - 1]
            ref = inverse_sigmoid(ref)
            logits = heads[lvl][0](inter_hidden[lvl])
            delta = heads[lvl][1](inter_hidden[lvl])
            if ref.shape[-1] == 4:
                coord_logits = delta + ref
            else:
                coord_logits = delta.at[..., :2].add(ref)
            outputs_classes.append(logits)
            outputs_coords.append(jax.nn.sigmoid(coord_logits))

        return {
            "last_hidden_state": inter_hidden[-1],
            "logits": outputs_classes[-1],
            "pred_boxes": outputs_coords[-1],
            "all_logits": jnp.stack(outputs_classes, axis=1),   # [B,Lyr,Q,C]
            "all_pred_boxes": jnp.stack(outputs_coords, axis=1),
            "attention_queries": jnp.stack(attn_qs, axis=1),    # [B,Lyr,H,Q,Dh]
            "attention_keys": jnp.stack(attn_ks, axis=1),
            "init_reference_points": init_reference,
            "intermediate_reference_points": jnp.stack(inter_refs, axis=1),
            "encoder_last_hidden_state": encoder_hidden,
            "enc_outputs_class": enc_outputs_class,
            "enc_outputs_coord_logits": enc_outputs_coord_logits,
        }


def _gen_encoder_output_proposals(enc_output, mask_flatten, spatial_shapes):
    """Proposal grid from encoder memory (deformable_detr.py:2098-2159).

    Returns (object_query [B,S,E] with padded/invalid positions zeroed,
    output_proposals [B,S,4] inverse-sigmoid coords with invalid -> +inf).
    """
    B, S, E = enc_output.shape
    proposals = []
    start = 0
    for level, (h, w) in enumerate(spatial_shapes):
        if mask_flatten is not None:
            m = mask_flatten[:, start:start + h * w].reshape(B, h, w)
            valid_h = m[:, :, 0].sum(1).astype(jnp.float32)
            valid_w = m[:, 0, :].sum(1).astype(jnp.float32)
        else:
            valid_h = jnp.full((B,), float(h))
            valid_w = jnp.full((B,), float(w))
        gy, gx = jnp.meshgrid(
            jnp.linspace(0, h - 1, h, dtype=jnp.float32),
            jnp.linspace(0, w - 1, w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], -1)[None]                      # [1,h,w,2]
        scale = jnp.stack([valid_w, valid_h], -1).reshape(B, 1, 1, 2)
        grid = (jnp.broadcast_to(grid, (B, h, w, 2)) + 0.5) / scale
        wh = jnp.ones_like(grid) * 0.05 * (2.0 ** level)
        proposals.append(
            jnp.concatenate([grid, wh], -1).reshape(B, -1, 4))
        start += h * w
    output_proposals = jnp.concatenate(proposals, 1)              # [B,S,4]
    valid = ((output_proposals > 0.01) & (output_proposals < 0.99)).all(
        -1, keepdims=True)
    output_proposals = jnp.log(
        output_proposals / (1 - output_proposals))
    if mask_flatten is not None:
        output_proposals = jnp.where(
            mask_flatten[..., None], output_proposals, jnp.inf)
    output_proposals = jnp.where(valid, output_proposals, jnp.inf)

    object_query = enc_output
    if mask_flatten is not None:
        object_query = jnp.where(mask_flatten[..., None], object_query, 0.0)
    object_query = jnp.where(valid, object_query, 0.0)
    return object_query, output_proposals


def _proposal_pos_embed(proposals, num_pos_feats: int = 128,
                        temperature: float = 10000.0):
    """Sine embedding of proposal coords (deformable_detr.py:2076-2096).
    proposals: [B,k,4] logits -> [B,k,4*num_pos_feats]."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos = jax.nn.sigmoid(proposals) * scale
    pos = pos[..., None] / dim_t                                  # [B,k,4,F]
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)
    return pos.reshape(*pos.shape[:2], -1)
