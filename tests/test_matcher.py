"""Hungarian matcher vs scipy.optimize.linear_sum_assignment."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from egtr_tpu.ops.matcher import (
    _PAD_COST, compute_cost_matrix, hungarian_match)


def test_lsa_matches_scipy_total_cost(rng):
    B, Q, G = 4, 25, 10
    cost = rng.standard_normal((B, Q, G)).astype(np.float32) * 5
    num_boxes = np.array([10, 3, 7, 1], np.int32)
    # pad columns like the real pipeline
    for b in range(B):
        cost[b, :, num_boxes[b]:] = _PAD_COST
    res = hungarian_match(jnp.array(cost), jnp.array(num_boxes))
    q_idx = np.asarray(res.query_index)
    mc = np.asarray(res.matching_cost)
    for b in range(B):
        n = num_boxes[b]
        rows, cols = linear_sum_assignment(cost[b, :, :n].T)  # rows=targets
        ref_total = cost[b, :, :n].T[rows, cols].sum()
        got_total = mc[b, :n].sum()
        np.testing.assert_allclose(got_total, ref_total, rtol=1e-5)
        # assigned queries must be distinct
        assert len(set(q_idx[b, :n].tolist())) == n
        # every matched cost must equal the matrix entry
        for j in range(n):
            np.testing.assert_allclose(
                mc[b, j], cost[b, q_idx[b, j], j], rtol=1e-6)


def test_lsa_exact_indices_unique_optimum(rng):
    # construct a cost matrix with a unique optimum: large margins
    Q, G = 12, 5
    cost = rng.uniform(10, 20, size=(Q, G)).astype(np.float32)
    perm = rng.permutation(Q)[:G]
    for j, q in enumerate(perm):
        cost[q, j] = j * 0.01  # strongly preferred
    res = hungarian_match(jnp.array(cost[None]), jnp.array([G], np.int32))
    np.testing.assert_array_equal(np.asarray(res.query_index)[0], perm)
    gt_index = np.asarray(res.gt_index)[0]
    for j, q in enumerate(perm):
        assert gt_index[q] == j
    assert (gt_index[np.setdiff1d(np.arange(Q), perm)] == -1).all()


def test_cost_matrix_matches_reference_math(rng):
    """Independent numpy recomputation of the matcher cost
    (deformable_detr.py:2949-2996), including the smoothing shift."""
    B, Q, G, C = 2, 6, 3, 8
    logits = rng.standard_normal((B, Q, C)).astype(np.float32)
    pb = rng.uniform(0.2, 0.4, size=(B, Q, 4)).astype(np.float32)
    tb = rng.uniform(0.2, 0.4, size=(B, G, 4)).astype(np.float32)
    tid = rng.integers(0, C, size=(B, G)).astype(np.int32)
    valid = np.ones((B, G), bool)
    smoothing = 1e-14
    cc, bc, gc = 2.0, 5.0, 2.0

    cost = np.asarray(compute_cost_matrix(
        jnp.array(logits), jnp.array(pb), jnp.array(tid), jnp.array(tb),
        jnp.array(valid), cc, bc, gc, smoothing))

    alpha, gamma = 0.25, 2.0
    prob = 1 / (1 + np.exp(-logits))
    for b in range(B):
        for q in range(Q):
            for g in range(G):
                p = prob[b, q, tid[b, g]]
                neg = (1 - alpha) * p ** gamma * (-np.log(1 - p + 1e-8))
                pos = alpha * (1 - p) ** gamma * (-np.log(p + 1e-8))
                cls = pos - neg
                l1 = np.abs(pb[b, q] - tb[b, g]).sum()

                def xyxy(c):
                    return np.array([c[0] - c[2] / 2, c[1] - c[3] / 2,
                                     c[0] + c[2] / 2, c[1] + c[3] / 2])
                b1, b2 = xyxy(pb[b, q]), xyxy(tb[b, g])
                inter = max(0, min(b1[2], b2[2]) - max(b1[0], b2[0])) * \
                    max(0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
                a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
                a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
                union = a1 + a2 - inter
                iou = inter / union
                hull = (max(b1[2], b2[2]) - min(b1[0], b2[0])) * \
                    (max(b1[3], b2[3]) - min(b1[1], b2[1]))
                giou = iou - (hull - union) / hull
                ref = bc * l1 + cc * cls + gc * (-giou)
                cost_min = cc * (1 - alpha) * np.log(1e-8) - gc
                ref = ref - cost_min + (-np.log(1.0 / smoothing - 1.0))
                np.testing.assert_allclose(cost[b, q, g], ref, rtol=2e-4,
                                           atol=2e-4)


def test_matcher_scipy_index_parity_random(rng):
    """On random (generic, tie-free) matrices scipy and ours agree exactly."""
    for trial in range(5):
        Q, G = 30, 12
        cost = rng.standard_normal((Q, G)).astype(np.float32)
        res = hungarian_match(jnp.array(cost[None]),
                              jnp.array([G], np.int32))
        rows, cols = linear_sum_assignment(cost.T)
        np.testing.assert_array_equal(np.asarray(res.query_index)[0], cols)
