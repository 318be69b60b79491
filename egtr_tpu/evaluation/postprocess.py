"""Device-side eval postprocessing: top-k triplet scoring under jit.

The reference moves the full [Q,Q,R] relation tensor to host and runs a 2M
element ``argsort_desc`` in numpy per image (train_egtr.py:56-94). Here the
triplet scores and the top-k are computed on the TPU and only ~100 triples
per image cross the (slow) host link. Semantics match evaluate_batch:

- obj_scores/classes = max softmax over the first num_labels classes
- sub_ob = outer(obj_scores) with zero diagonal (no self-relations)
- pred_rel is clamped to [0,1] and multiplied by clamped connectivity
- multiple-preds: top-k over Q*Q*R triplet scores -> (s, o, p)
- single-preds (graph constraint): top-k over Q*Q of max-predicate score
  -> (s, o) plus the full R-vector of relation scores for those pairs
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_labels", "top_k"))
def sgg_postprocess(logits, pred_boxes, pred_rel, pred_connectivity,
                    *, num_labels: int, top_k: int = 100):
    """Per-batch top-k triplets. Returns a dict of small arrays.

    logits [B,Q,C], pred_boxes [B,Q,4] (cxcywh, normalized),
    pred_rel [B,Q,Q,R] (sigmoid), pred_connectivity [B,Q,Q,1] (sigmoid).
    """
    B, Q, _ = logits.shape
    R = pred_rel.shape[-1]
    top_k = min(top_k, Q * Q)  # tiny-config guard

    probs = jax.nn.softmax(logits, axis=-1)[..., :num_labels]
    obj_scores = probs.max(-1)                        # [B,Q]
    pred_classes = probs.argmax(-1)                   # [B,Q]

    sub_ob = obj_scores[:, :, None] * obj_scores[:, None, :]
    eye = jnp.eye(Q, dtype=bool)[None]
    sub_ob = jnp.where(eye, 0.0, sub_ob)              # [B,Q,Q]

    rel = jnp.clip(pred_rel, 0.0, 1.0) * jnp.clip(pred_connectivity, 0.0, 1.0)

    # multiple-preds path: top-k over the full triplet tensor
    trip = rel * sub_ob[..., None]                    # [B,Q,Q,R]
    mult_scores, mult_idx = jax.lax.top_k(trip.reshape(B, -1), top_k)
    mult_s = mult_idx // (Q * R)
    mult_o = (mult_idx // R) % Q
    mult_p = mult_idx % R
    mult_rel_scores = jnp.take_along_axis(
        rel.reshape(B, -1), mult_idx, axis=1)

    # single-preds path: top-k over pairs of max-predicate score
    pair_score = rel.max(-1) * sub_ob                 # [B,Q,Q]
    single_scores, single_idx = jax.lax.top_k(pair_score.reshape(B, -1), top_k)
    single_s = single_idx // Q
    single_o = single_idx % Q
    # gather the R-vector for each selected pair
    flat_rel = rel.reshape(B, Q * Q, R)
    single_rel_vec = jnp.take_along_axis(
        flat_rel, single_idx[..., None], axis=1)      # [B,k,R]

    return {
        "obj_scores": obj_scores,
        "pred_classes": pred_classes,
        "pred_boxes": pred_boxes,
        "mult_inds": jnp.stack([mult_s, mult_o, mult_p], -1),  # [B,k,3]
        "mult_rel_scores": mult_rel_scores,                    # [B,k]
        "mult_trip_scores": mult_scores,
        "single_inds": jnp.stack([single_s, single_o], -1),    # [B,k,2]
        "single_rel_vec": single_rel_vec,                      # [B,k,R]
        "single_pair_scores": single_scores,
    }


@functools.partial(jax.jit, static_argnames=("top_k",))
def detection_postprocess(logits, pred_boxes, target_sizes, top_k: int = 100):
    """COCO-style detection post-processing on device.

    Reference: DeformableDetrFeatureExtractor.post_process
    (deformable_detr.py:273-319): sigmoid probs, top-100 over the flattened
    Q x C grid, gather boxes, scale to absolute (h, w) coordinates.
    Returns dict(scores [B,k], labels [B,k], boxes [B,k,4] xyxy abs).
    """
    B, Q, C = logits.shape
    top_k = min(top_k, Q * C)
    prob = jax.nn.sigmoid(logits).reshape(B, -1)
    scores, idx = jax.lax.top_k(prob, top_k)
    box_idx = idx // C
    labels = idx % C
    cx, cy, w, h = jnp.split(pred_boxes, 4, axis=-1)
    xyxy = jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    boxes = jnp.take_along_axis(xyxy, box_idx[..., None], axis=1)
    img_h = target_sizes[:, 0].astype(boxes.dtype)
    img_w = target_sizes[:, 1].astype(boxes.dtype)
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes * scale}


def rescale_boxes_np(boxes_cxcywh, orig_hw):
    """Normalized cxcywh -> absolute xyxy at the original image size
    (util/box_ops.py:87-93 with torch.flip(orig_size))."""
    import numpy as np

    h, w = float(orig_hw[0]), float(orig_hw[1])
    b = np.asarray(boxes_cxcywh, np.float64)
    xyxy = np.stack([
        b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
        b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], 1)
    return xyxy * np.array([w, h, w, h])
