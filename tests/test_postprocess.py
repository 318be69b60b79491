"""Device-side SGG postprocess vs a numpy replication of the reference's
evaluate_batch scoring flow (train_egtr.py:43-173)."""

import numpy as np
import jax.numpy as jnp

from egtr_tpu.evaluation.postprocess import sgg_postprocess
from egtr_tpu.evaluation.sg_eval import argsort_desc


def make(rng, B=2, Q=9, C=6, R=5):
    logits = rng.standard_normal((B, Q, C)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.7, (B, Q, 4)).astype(np.float32)
    rel = rng.uniform(0, 1, (B, Q, Q, R)).astype(np.float32)
    conn = rng.uniform(0, 1, (B, Q, Q, 1)).astype(np.float32)
    return logits, boxes, rel, conn


def reference_flow(logits, rel, conn, num_labels, topk):
    """numpy transcription of evaluate_batch's scoring (per image)."""
    Q = logits.shape[0]
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    obj_scores = probs[:, :num_labels].max(-1)
    pred_classes = probs[:, :num_labels].argmax(-1)
    sub_ob = np.outer(obj_scores, obj_scores)
    np.fill_diagonal(sub_ob, 0.0)
    r = np.clip(rel, 0, 1) * np.clip(conn, 0, 1)

    # multiple-preds: top-k over Q*Q*R
    trip = r * sub_ob[..., None]
    mult_inds = argsort_desc(trip)[:topk]
    mult_rel_scores = r[mult_inds[:, 0], mult_inds[:, 1], mult_inds[:, 2]]

    # single-preds: top-k over Q*Q of max-predicate
    pair = r.max(-1) * sub_ob
    single_inds = argsort_desc(pair)[:topk]
    single_vec = r[single_inds[:, 0], single_inds[:, 1]]
    return (obj_scores, pred_classes, mult_inds, mult_rel_scores,
            single_inds, single_vec)


def test_postprocess_matches_reference_flow(rng):
    B, Q, C, R = 2, 9, 6, 5
    logits, boxes, rel, conn = make(rng, B, Q, C, R)
    topk = 20
    post = sgg_postprocess(jnp.array(logits), jnp.array(boxes),
                           jnp.array(rel), jnp.array(conn),
                           num_labels=C, top_k=topk)
    for b in range(B):
        (obj_scores, pred_classes, mult_inds, mult_scores, single_inds,
         single_vec) = reference_flow(logits[b], rel[b], conn[b], C, topk)
        np.testing.assert_allclose(np.asarray(post["obj_scores"][b]),
                                   obj_scores, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(post["pred_classes"][b]),
                                      pred_classes)
        # scores must match; index ties can break differently but scores
        # define the evaluator input ordering
        got_trip = np.asarray(post["mult_trip_scores"][b])
        want_trip = (rel[b] * np.clip(conn[b], 0, 1))[
            mult_inds[:, 0], mult_inds[:, 1], mult_inds[:, 2]] * \
            np.outer(obj_scores, obj_scores)[mult_inds[:, 0], mult_inds[:, 1]]
        # recompute expected sorted triplet scores directly
        trip = (np.clip(rel[b], 0, 1) * np.clip(conn[b], 0, 1)
                * (np.outer(obj_scores, obj_scores)
                   * (1 - np.eye(Q)))[..., None])
        want_sorted = np.sort(trip.ravel())[::-1][:topk]
        np.testing.assert_allclose(got_trip, want_sorted, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(post["mult_inds"][b]),
                                      mult_inds)
        np.testing.assert_allclose(np.asarray(post["mult_rel_scores"][b]),
                                   mult_scores, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(post["single_inds"][b]),
                                      single_inds)
        np.testing.assert_allclose(np.asarray(post["single_rel_vec"][b]),
                                   single_vec, rtol=1e-5)
