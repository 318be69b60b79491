"""Native C++ kernels vs numpy reference implementations."""

import numpy as np

from egtr_tpu import native
from egtr_tpu.evaluation.sg_eval import (
    _compute_pred_matches, _triplet, bbox_overlaps_plus1, intersect_2d)


def random_boxes(rng, n):
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    return np.concatenate([xy, xy + wh], 1)


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ build failed"


def test_bbox_overlaps_matches_numpy(rng):
    a = random_boxes(rng, 23)
    b = random_boxes(rng, 17)
    np.testing.assert_allclose(
        native.bbox_overlaps(a, b), np.asarray(bbox_overlaps_plus1(a, b)),
        rtol=1e-12)


def test_triplet_matches_equals_python_path(rng):
    n_gt, n_pred = 6, 40
    gt_trip = rng.integers(0, 5, (n_gt, 3))
    pred_trip = rng.integers(0, 5, (n_pred, 3))
    # make some predictions exactly equal to gts
    pred_trip[:n_gt] = gt_trip
    gt_boxes = np.concatenate(
        [random_boxes(rng, n_gt), random_boxes(rng, n_gt)], 1)
    pred_boxes = np.concatenate(
        [random_boxes(rng, n_pred), random_boxes(rng, n_pred)], 1)
    pred_boxes[:n_gt] = gt_boxes + rng.normal(0, 2, gt_boxes.shape)

    for phrdet in (False, True):
        dense = native.triplet_matches(gt_trip, gt_boxes, pred_trip,
                                       pred_boxes, 0.5, phrdet)
        assert dense is not None

        # python reference path (the pre-native branch)
        keeps = intersect_2d(gt_trip, pred_trip)
        expected = [[] for _ in range(n_pred)]
        for g in range(n_gt):
            if not keeps[g].any():
                continue
            idxs = np.where(keeps[g])[0]
            boxes = pred_boxes[idxs]
            if phrdet:
                gu = gt_boxes[g].reshape(2, 4)
                gu = np.concatenate((gu.min(0)[:2], gu.max(0)[2:]), 0)
                bu = boxes.reshape(-1, 2, 4)
                bu = np.concatenate((bu.min(1)[:, :2], bu.max(1)[:, 2:]), 1)
                ok = bbox_overlaps_plus1(gu[None], bu)[0] >= 0.5
            else:
                s = bbox_overlaps_plus1(gt_boxes[g][None, :4],
                                        boxes[:, :4])[0]
                o = bbox_overlaps_plus1(gt_boxes[g][None, 4:],
                                        boxes[:, 4:])[0]
                ok = (s >= 0.5) & (o >= 0.5)
            for p in idxs[np.asarray(ok)]:
                expected[p].append(g)

        got = [[] for _ in range(n_pred)]
        gs, ps = np.nonzero(dense)
        for g, p in zip(gs, ps):
            got[p].append(int(g))
        assert got == expected, f"phrdet={phrdet}"


def test_compute_pred_matches_uses_native(rng):
    """The public matcher must produce identical output with and without the
    native path (here we just check it runs and matches the slow path by
    construction of the previous test)."""
    gt_trip = np.array([[1, 2, 3]])
    pred_trip = np.array([[1, 2, 3], [0, 0, 0]])
    gt_boxes = np.array([[0, 0, 50, 50, 60, 60, 100, 100]], float)
    pred_boxes = np.array([[0, 0, 50, 50, 60, 60, 100, 100],
                           [0, 0, 10, 10, 20, 20, 30, 30]], float)
    out = _compute_pred_matches(gt_trip, pred_trip, gt_boxes, pred_boxes,
                                0.5, False)
    assert out == [[0], []]
