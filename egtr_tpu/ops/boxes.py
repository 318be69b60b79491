"""Vectorized box utilities (JAX).

Replaces the reference's ``util/box_ops.py`` / ``model/util.py`` box helpers and
the Cython ``lib/fpn/box_intersections_cpu/bbox.pyx`` kernel with pure JAX ops.
Two IoU conventions exist in the reference and both are kept:

- the clean IoU/GIoU used by matcher & losses (model/util.py:90-124), and
- the "+1 pixel" IoU used by the scene-graph recall evaluator
  (bbox.pyx:40-60) — see :func:`box_iou_plus1`.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b):
    """(cx, cy, w, h) -> (x0, y0, x1, y1). Reference: util/box_ops.py:11-16."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def rescale_bboxes(out_bbox, size_wh):
    """Scale normalized cxcywh boxes to absolute xyxy. Reference: util/box_ops.py:87-93."""
    w, h = size_wh[0], size_wh[1]
    b = box_cxcywh_to_xyxy(out_bbox)
    return b * jnp.stack([w, h, w, h]).astype(b.dtype)


def box_area(boxes):
    """Area of xyxy boxes. Reference: model/util.py:75-87."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1, boxes2):
    """Pairwise IoU of xyxy boxes [N,4] x [M,4] -> ([N,M], union[N,M]).

    Reference: model/util.py:90-104.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / union
    return iou, union


def generalized_box_iou(boxes1, boxes2):
    """Pairwise GIoU [N,M] of xyxy boxes.

    Reference: model/util.py:107-126. Degenerate boxes are the caller's
    responsibility (the torch version asserts; under jit we cannot).
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def box_iou_plus1(boxes1, boxes2):
    """Pairwise IoU with the evaluator's "+1 pixel" convention.

    Mirrors the Cython ``bbox_overlaps`` (lib/fpn/box_intersections_cpu/
    bbox.pyx:15-60): width = x2 - x1 + 1, so zero-width boxes have area 1.
    Degenerate (negative-overlap) pairs contribute 0.
    Works on numpy or jax arrays.
    """
    area2 = (boxes2[..., 2] - boxes2[..., 0] + 1) * (
        boxes2[..., 3] - boxes2[..., 1] + 1
    )
    area1 = (boxes1[..., 2] - boxes1[..., 0] + 1) * (
        boxes1[..., 3] - boxes1[..., 1] + 1
    )
    iw = (
        jnp.minimum(boxes1[..., :, None, 2], boxes2[..., None, :, 2])
        - jnp.maximum(boxes1[..., :, None, 0], boxes2[..., None, :, 0])
        + 1
    )
    ih = (
        jnp.minimum(boxes1[..., :, None, 3], boxes2[..., None, :, 3])
        - jnp.maximum(boxes1[..., :, None, 1], boxes2[..., None, :, 1])
        + 1
    )
    iw = jnp.clip(iw, 0)
    ih = jnp.clip(ih, 0)
    inter = iw * ih
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union


def inverse_sigmoid(x, eps: float = 1e-5):
    """logit with clamping. Reference: deformable_detr.py:458-464."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
