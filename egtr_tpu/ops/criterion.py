"""Detection + scene-graph losses, fully padded/masked for one jit program.

TPU-native re-expression of ``DeformableDetrLoss``
(model/deformable_detr.py:2653-2861) and ``SceneGraphGenerationLoss``
(model/egtr.py:544-1034). All per-image python loops, ``nonzero`` calls and
variable-size index lists in the reference become fixed-shape masked
reductions and static-k top-k selections; the loss *values* are identical.

Padded target convention (see data pipeline):
    class_labels [B, G] int32, boxes [B, G, 4] cxcywh (pad = (0.5,0.5,1,1)),
    num_boxes [B] int32, rel [B, G, G, R] {0,1}.

Note on distributed normalization: like the reference (egtr.py:976-980 keeps
the ``num_boxes`` all-reduce commented out), normalization is per-shard.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EgtrConfig
from .boxes import box_cxcywh_to_xyxy, generalized_box_iou
from .losses import bce_with_logits, sigmoid_focal_loss_elementwise
from .matcher import MatchResult, compute_cost_matrix, hungarian_match


def nonmatching_cost(cfg: EgtrConfig) -> float:
    """Analytic max matching cost for unmatched queries (egtr.py:598-603)."""
    return float(
        -math.log(1e-8) * cfg.ce_loss_coefficient
        + 4 * cfg.bbox_cost
        + 2 * cfg.giou_cost
        - math.log(1.0 / cfg.smoothing - 1.0)
    )


def match(logits, pred_boxes, targets, cfg: EgtrConfig,
          class_cost: Optional[float] = None,
          smoothing: Optional[float] = None) -> MatchResult:
    """Build the cost matrix on device and solve the assignment in-jit."""
    valid = (jnp.arange(targets["class_labels"].shape[1])[None]
             < targets["num_boxes"][:, None])
    cost = compute_cost_matrix(
        logits, pred_boxes, targets["class_labels"], targets["boxes"], valid,
        class_cost=cfg.ce_loss_coefficient if class_cost is None else class_cost,
        bbox_cost=cfg.bbox_cost, giou_cost=cfg.giou_cost,
        smoothing=cfg.smoothing if smoothing is None else smoothing,
        focal_alpha=0.25)
    # the matcher is no-grad in the reference (@torch.no_grad,
    # deformable_detr.py:2925) — and lax.while_loop is not reverse-mode
    # differentiable, so cut the tape before solving
    res = hungarian_match(jax.lax.stop_gradient(cost), targets["num_boxes"])
    return MatchResult(*jax.lax.stop_gradient(tuple(res)))


def detection_losses(logits, pred_boxes, targets, res: MatchResult,
                     num_boxes_total, cfg: EgtrConfig,
                     valid_img=None) -> Dict[str, jax.Array]:
    """labels (focal), boxes (L1 + GIoU), cardinality.

    Reference reductions: loss_ce = focal.mean(1).sum()/num_boxes * Q
    == elementwise_sum / num_boxes (egtr.py:648-659); box losses are
    sums over matched pairs / num_boxes (egtr.py:693-719).

    ``valid_img`` ([B] float, optional): per-image weight — 0 for the
    duplicated pad rows a padded eval tail carries (data/loader.py), so
    the validation loss over a padded batch equals the loss over its
    real rows only. None = all ones (training batches are never padded).
    """
    B, Q, C = logits.shape
    G = targets["class_labels"].shape[1]
    v = jnp.ones((B,), logits.dtype) if valid_img is None else valid_img
    valid = (jnp.arange(G)[None] < targets["num_boxes"][:, None]) \
        & (v[:, None] > 0)                                         # [B,G]

    # --- classification (focal over one-hot with background dropped) ---
    matched = res.gt_index >= 0                                    # [B,Q]
    cls_of_q = jnp.take_along_axis(
        targets["class_labels"], jnp.clip(res.gt_index, 0), axis=1)
    target_classes = jnp.where(matched, cls_of_q, C)               # [B,Q]
    onehot = jax.nn.one_hot(target_classes, C + 1,
                            dtype=logits.dtype)[..., :-1]          # [B,Q,C]
    focal = sigmoid_focal_loss_elementwise(
        logits, onehot, alpha=cfg.focal_alpha, gamma=2.0)
    loss_ce = (focal.sum(axis=(1, 2)) * v).sum() / num_boxes_total

    # --- boxes ---
    src_boxes = jnp.take_along_axis(
        pred_boxes, res.query_index[..., None], axis=1)            # [B,G,4]
    l1 = jnp.abs(src_boxes - targets["boxes"]).sum(-1)             # [B,G]
    loss_bbox = jnp.where(valid, l1, 0.0).sum() / num_boxes_total

    giou = jax.vmap(lambda a, b: jnp.diagonal(generalized_box_iou(
        box_cxcywh_to_xyxy(a), box_cxcywh_to_xyxy(b))))(
            src_boxes, targets["boxes"])                           # [B,G]
    loss_giou = jnp.where(valid, 1.0 - giou, 0.0).sum() / num_boxes_total

    # --- cardinality (logging; quirk preserved: compares argmax to the
    #     LAST real class since there is no background logit,
    #     egtr.py:663-677) ---
    card_pred = (jnp.argmax(logits, -1) != C - 1).sum(1)
    card_abs = jnp.abs(
        card_pred.astype(jnp.float32)
        - targets["num_boxes"].astype(jnp.float32))
    card_err = (card_abs * v).sum() / jnp.maximum(v.sum(), 1.0)

    return {"loss_ce": loss_ce, "loss_bbox": loss_bbox,
            "loss_giou": loss_giou, "cardinality_error": card_err}


def uncertainty_loss(targets, res: MatchResult, valid_img=None) -> jax.Array:
    """No-grad diagnostic (egtr.py:679-689): mean over gt relation entries of
    sigmoid(cost_i) * sigmoid(cost_j). ``valid_img`` zeroes pad images."""
    u = jax.nn.sigmoid(res.matching_cost)                          # [B,G]
    rel_n = targets["rel"].sum(-1)                                 # [B,G,G]
    pair_u = u[:, :, None] * u[:, None, :]                         # [B,G,G]
    if valid_img is not None:
        # one mask on the [B,G,G] grid covers both the numerator product
        # and the entry count
        rel_n = rel_n * valid_img[:, None, None]
    total = (rel_n * pair_u).sum()
    count = rel_n.sum()
    return jax.lax.stop_gradient(total / jnp.maximum(count, 1.0))


def _permuted_rel_target(targets, res: MatchResult, Q: int):
    """Query-indexed dense relation target [B,Q,Q,R] plus per-query weights.

    Equivalent to the reference's full_src/full_target permutation
    (egtr.py:754-781): row q of the target is the gt row matched to query q
    (zeros if unmatched), and summing any pairwise loss over all (q1,q2) is
    invariant to the permutation.
    """
    B, G, _, R = targets["rel"].shape
    rel_pad = jnp.pad(targets["rel"], ((0, 0), (0, 1), (0, 1), (0, 0)))
    idx = jnp.where(res.gt_index >= 0, res.gt_index, G)             # [B,Q]
    t1 = jnp.take_along_axis(
        rel_pad, idx[:, :, None, None], axis=1)                     # [B,Q,G+1,R]
    target_q = jnp.take_along_axis(
        t1, idx[:, None, :, None], axis=2)                          # [B,Q,Q,R]
    return target_q


def relation_losses(pred_rel_logits, pred_conn_logits, targets,
                    res: MatchResult, cfg: EgtrConfig, train: bool,
                    rng: Optional[jax.Array] = None,
                    valid_img=None) -> Dict[str, jax.Array]:
    """loss_rel + loss_connectivity (egtr.py:754-921).

    Training uses hard-negative sampling: per image, k = num_gt_rels *
    rel_sample_negatives largest-scoring negatives within the matched block,
    and likewise for non-matching pairs, re-expressed as fixed-size top-k
    with rank masking. Eval averages BCE.mean(-1) over all Q^2 pairs.
    ``valid_img`` ([B] float) zeroes pad images' contributions.
    """
    B, Q, _, R = pred_rel_logits.shape
    v = jnp.ones((B,), jnp.float32) if valid_img is None \
        else valid_img.astype(jnp.float32)
    nv = jnp.maximum(v.sum(), 1.0)
    nm_cost = nonmatching_cost(cfg)

    matched = res.gt_index >= 0                                     # [B,Q]
    cost_q = jnp.where(
        matched,
        jnp.take_along_axis(res.matching_cost, jnp.clip(res.gt_index, 0),
                            axis=1),
        nm_cost)
    w = 1.0 - jax.nn.sigmoid(cost_q)                                # [B,Q]
    pair_w = w[:, :, None] * w[:, None, :]                          # [B,Q,Q]

    target_q = _permuted_rel_target(targets, res, Q)                # [B,Q,Q,R]

    # --- connectivity (always over all pairs; egtr.py:783-796) ---
    target_conn = (target_q.max(-1, keepdims=True) > 0).astype(
        pred_conn_logits.dtype)                                     # [B,Q,Q,1]
    conn_bce = bce_with_logits(pred_conn_logits, target_conn)
    loss_connectivity = (conn_bce.mean(axis=(1, 2, 3)) * v).sum() / nv

    # adaptive smoothing weight applied to positive targets
    smoothed_target = target_q * pair_w[..., None]

    if not train or (cfg.rel_sample_negatives is None
                     and cfg.rel_sample_nonmatching is None):
        per_img = bce_with_logits(pred_rel_logits, smoothed_target)\
            .mean(axis=(1, 2, 3))
        loss_rel = (per_img * v).sum() / nv
        return {"loss_rel": loss_rel, "loss_connectivity": loss_connectivity}

    # --- training: sampled entries ---
    pair_matched = matched[:, :, None] & matched[:, None, :]        # [B,Q,Q]
    true_mask = (target_q == 1.0)                                   # [B,Q,Q,R]
    n_true = true_mask.sum(axis=(1, 2, 3))                          # [B]

    bce_all = bce_with_logits(pred_rel_logits, smoothed_target)     # [B,Q,Q,R]
    sum_true = jnp.where(true_mask, bce_all, 0.0).sum(axis=(1, 2, 3))

    def sampled_sum(cand_mask, k_per_rel, largest, key):
        """Sum of BCE(pred, 0) over k = min(k_per_rel * n_true, avail)
        candidates, chosen by largest pred (or uniformly)."""
        if k_per_rel is None:
            return jnp.zeros((B,)), jnp.zeros((B,))
        avail = cand_mask.sum(axis=(1, 2, 3))
        K = min(int(k_per_rel * cfg.max_gt_rels),
                int(np.prod(pred_rel_logits.shape[1:])))
        k_eff = jnp.minimum(k_per_rel * n_true, avail)              # [B]
        k_eff = jnp.where(n_true == 0, 0, jnp.minimum(k_eff, K))
        flat_logits = pred_rel_logits.reshape(B, -1)
        if largest:
            score = jnp.where(cand_mask.reshape(B, -1), flat_logits, -jnp.inf)
        else:
            u = jax.random.uniform(key, flat_logits.shape)
            score = jnp.where(cand_mask.reshape(B, -1), u, -jnp.inf)
        if cfg.rel_sample_approx_topk:
            # TPU-native partial reduction (~95% recall of the true
            # top-K); which negatives are mined differs slightly from
            # the reference's exact torch.topk — opt-in only
            top_vals, top_idx = jax.lax.approx_max_k(score, K)      # [B,K]
        else:
            top_vals, top_idx = jax.lax.top_k(score, K)             # [B,K]
        sel_logits = jnp.take_along_axis(flat_logits, top_idx, axis=1)
        rank_ok = (jnp.arange(K)[None] < k_eff[:, None]) & jnp.isfinite(top_vals)
        # BCE with target 0 == softplus(logit)
        sp = jnp.maximum(sel_logits, 0.0) + jnp.log1p(
            jnp.exp(-jnp.abs(sel_logits)))
        return jnp.where(rank_ok, sp, 0.0).sum(axis=1), k_eff

    key_neg = key_nonm = None
    if rng is not None:
        key_neg, key_nonm = jax.random.split(rng)
    elif (not cfg.rel_sample_negatives_largest
          or not cfg.rel_sample_nonmatching_largest):
        # uniform (largest=False) sampling needs randomness; fail loudly at
        # trace time instead of crashing inside jax.random.uniform
        raise ValueError(
            "relation_losses: rng is required when rel_sample_*_largest is "
            "False (uniform negative sampling)")
    false_mask = pair_matched[..., None] & (target_q != 1.0)
    nonm_mask = jnp.broadcast_to(
        (~pair_matched)[..., None], target_q.shape)
    sum_neg, k_neg = sampled_sum(
        false_mask, cfg.rel_sample_negatives,
        cfg.rel_sample_negatives_largest, key_neg)
    sum_nonm, k_nonm = sampled_sum(
        nonm_mask, cfg.rel_sample_nonmatching,
        cfg.rel_sample_nonmatching_largest, key_nonm)

    total = ((sum_true + sum_neg + sum_nonm) * v).sum()
    count = ((n_true + k_neg + k_nonm) * v).sum()
    loss_rel = total / jnp.maximum(count, 1)
    # Static top-k size caps sampled negatives at rel_sample_* *
    # max_gt_rels per image; the reference caps only at the number of
    # available candidates (egtr.py:848-907). The cap binds only for
    # images with > max_gt_rels true relation entries — surface how often
    # as a streamed metric so silent divergence is visible in training logs.
    capped = ((n_true > cfg.max_gt_rels) * v).sum() / nv
    return {"loss_rel": loss_rel, "loss_connectivity": loss_connectivity,
            "rel_sample_capped_frac": capped}


def _enc_losses(outputs, targets, cfg: EgtrConfig, num_boxes_total,
                losses: dict, weight: dict,
                smoothing: Optional[float] = None, valid_img=None) -> None:
    """Two-stage proposal losses with binarized class labels
    (egtr.py:1019-1033 / deformable_detr.py:2848-2859)."""
    if not cfg.two_stage or outputs.get("enc_outputs_class") is None:
        return
    enc_logits = outputs["enc_outputs_class"]
    enc_boxes = jax.nn.sigmoid(outputs["enc_outputs_coord_logits"])
    bin_targets = dict(targets)
    bin_targets["class_labels"] = jnp.zeros_like(targets["class_labels"])
    res = match(enc_logits, enc_boxes, bin_targets, cfg, smoothing=smoothing)
    enc = detection_losses(enc_logits, enc_boxes, bin_targets, res,
                           num_boxes_total, cfg, valid_img=valid_img)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        losses[f"{k}_enc"] = enc[k]
        weight[f"{k}_enc"] = weight[k]
    losses["cardinality_error_enc"] = enc["cardinality_error"]


def sgg_criterion(outputs, targets, cfg: EgtrConfig, train: bool,
                  rng: Optional[jax.Array] = None, valid=None
                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full EGTR loss (egtr.py:421-505 + SceneGraphGenerationLoss.forward).

    ``valid`` ([B] bool, optional): per-image mask for padded eval tails
    (data/loader.py pads trailing partial batches with duplicates of the
    last image); masked losses equal the losses over the real rows only.
    """
    logits = outputs["logits"]
    pred_boxes = outputs["pred_boxes"]
    v = None if valid is None else valid.astype(jnp.float32)
    num_boxes = targets["num_boxes"].astype(jnp.float32)
    if v is not None:
        num_boxes = num_boxes * v
    num_boxes_total = jnp.maximum(num_boxes.sum(), 1.0)

    res = match(logits, pred_boxes, targets, cfg)
    losses = detection_losses(
        logits, pred_boxes, targets, res, num_boxes_total, cfg, valid_img=v)
    losses.update(relation_losses(
        outputs["pred_rel_logits"], outputs["pred_connectivity_logits"],
        targets, res, cfg, train, rng, valid_img=v))
    losses["uncertainty"] = uncertainty_loss(targets, res, valid_img=v)

    weight = {
        "loss_ce": cfg.ce_loss_coefficient,
        "loss_bbox": cfg.bbox_loss_coefficient,
        "loss_giou": cfg.giou_loss_coefficient,
        "loss_rel": cfg.rel_loss_coefficient,
        "loss_connectivity": cfg.connectivity_loss_coefficient,
    }

    if cfg.auxiliary_loss:
        for i in range(cfg.decoder_layers - 1):
            aux_logits = outputs["all_logits"][:, i]
            aux_boxes = outputs["all_pred_boxes"][:, i]
            aux_res = match(aux_logits, aux_boxes, targets, cfg)
            aux = detection_losses(
                aux_logits, aux_boxes, targets, aux_res, num_boxes_total,
                cfg, valid_img=v)
            for k in ("loss_ce", "loss_bbox", "loss_giou"):
                losses[f"{k}_{i}"] = aux[k]
                weight[f"{k}_{i}"] = weight[k]
            losses[f"cardinality_error_{i}"] = aux["cardinality_error"]

    _enc_losses(outputs, targets, cfg, num_boxes_total, losses, weight,
                valid_img=v)
    total = sum(losses[k] * w for k, w in weight.items() if k in losses)
    return total, losses


def detection_criterion(outputs, targets, cfg: EgtrConfig, valid=None
                        ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Detector pretraining loss (DeformableDetrForObjectDetection,
    deformable_detr.py:2562-2618): labels/boxes/cardinality with matcher
    class_cost = ce_loss_coefficient, no smoothing; aux per-layer re-match.
    ``valid``: per-image mask for padded eval tails (see sgg_criterion)."""
    logits = outputs["logits"]
    pred_boxes = outputs["pred_boxes"]
    v = None if valid is None else valid.astype(jnp.float32)
    num_boxes = targets["num_boxes"].astype(jnp.float32)
    if v is not None:
        num_boxes = num_boxes * v
    num_boxes_total = jnp.maximum(num_boxes.sum(), 1.0)

    res = match(logits, pred_boxes, targets, cfg, smoothing=0.0)
    losses = detection_losses(
        logits, pred_boxes, targets, res, num_boxes_total, cfg, valid_img=v)

    weight = {
        "loss_ce": cfg.ce_loss_coefficient,
        "loss_bbox": cfg.bbox_loss_coefficient,
        "loss_giou": cfg.giou_loss_coefficient,
    }
    if cfg.auxiliary_loss:
        for i in range(cfg.decoder_layers - 1):
            aux_logits = outputs["all_logits"][:, i]
            aux_boxes = outputs["all_pred_boxes"][:, i]
            aux_res = match(aux_logits, aux_boxes, targets, cfg, smoothing=0.0)
            aux = detection_losses(
                aux_logits, aux_boxes, targets, aux_res, num_boxes_total,
                cfg, valid_img=v)
            for k in ("loss_ce", "loss_bbox", "loss_giou"):
                losses[f"{k}_{i}"] = aux[k]
                weight[f"{k}_{i}"] = weight[k]
            losses[f"cardinality_error_{i}"] = aux["cardinality_error"]

    _enc_losses(outputs, targets, cfg, num_boxes_total, losses, weight,
                smoothing=0.0, valid_img=v)
    total = sum(losses[k] * w for k, w in weight.items() if k in losses)
    return total, losses
