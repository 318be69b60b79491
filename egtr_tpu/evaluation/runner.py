"""Reusable SGG/detection evaluation loop.

Factored out of the evaluate driver so the training drivers can run the
same end-of-training evaluation the reference runs after fitting
(train_egtr.py:879-935, pretrain_detr.py:500-542) and dump a metrics JSON
next to the artifact.

Detection (COCO) updates run for EVERY image — including images with zero
ground-truth relations — matching the reference, which evaluates detection
on the whole split (train_egtr.py:369-396) while the SGG recall evaluator
skips relation-less images.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np


def evaluate_sgg(model, cfg, params, loader, rel_categories: Sequence[str], *,
                 eval_single_preds: bool = True,
                 eval_multiple_preds: bool = False,
                 coco_eval: bool = False,
                 oi_evaluator=None,
                 max_images: Optional[int] = None,
                 categories=None) -> Dict[str, float]:
    """Run the full evaluation protocol over ``loader``; returns metrics.

    oi_evaluator: an ``OIEvaluator`` for Open Images runs (scores all Q^2
    pairs, train_egtr.py:154-173); None for Visual Genome.
    categories: detection category ids for the COCO evaluator (defaults to
    range(num_labels)).
    """
    import jax
    import jax.numpy as jnp

    from .postprocess import rescale_boxes_np, sgg_postprocess
    from .sg_eval import (SceneGraphEvaluator, evaluate_mean_recall,
                          evaluate_per_predicate)

    need_full_rel = oi_evaluator is not None

    @jax.jit
    def infer(params, pixel_values, pixel_mask):
        out = model.apply(params, pixel_values, pixel_mask,
                          deterministic=True)
        post = sgg_postprocess(
            out["logits"], out["pred_boxes"], out["pred_rel"],
            out["pred_connectivity"], num_labels=cfg.num_labels, top_k=100)
        if coco_eval:
            from .postprocess import detection_postprocess
            det = detection_postprocess(
                out["logits"], out["pred_boxes"],
                jnp.ones((out["logits"].shape[0], 2), jnp.int32), top_k=100)
            post["det_scores"] = det["scores"]
            post["det_labels"] = det["labels"]
            post["det_boxes_norm"] = det["boxes"]  # unit scale; rescale host-side
        if need_full_rel:
            post["rel_full"] = (jnp.clip(out["pred_rel"], 0, 1)
                                * jnp.clip(out["pred_connectivity"], 0, 1))
        return post

    from ..utils.aot import maybe_aot
    infer = maybe_aot(infer, "eval_infer")

    coco = None
    if coco_eval:
        from .coco_eval import CocoEvaluator
        # VG detection eval re-offsets category ids by +1
        # (lib/evaluation/coco_eval.py:44-45)
        coco = CocoEvaluator(sorted(categories)
                             if categories is not None
                             else list(range(cfg.num_labels)))

    single = SceneGraphEvaluator(multiple_preds=False) \
        if eval_single_preds else None
    multiple = SceneGraphEvaluator(multiple_preds=True) \
        if eval_multiple_preds else None
    per_pred_single = {name: SceneGraphEvaluator(multiple_preds=False)
                       for name in rel_categories} \
        if eval_single_preds else None
    # the reference computes mean recall for BOTH evaluator modes — the
    # paper reports the unconstrained mR from the multiple-preds list
    # (train_egtr.py:112-121,410-417, sg_eval.py:331-372)
    per_pred_multiple = {name: SceneGraphEvaluator(multiple_preds=True)
                         for name in rel_categories} \
        if eval_multiple_preds else None

    n_img = 0
    _so_pairs: dict = {}
    for batch in loader:
        post = infer(params, jnp.asarray(batch["pixel_values"]),
                     jnp.asarray(batch["pixel_mask"]))
        post = {k: np.asarray(v) for k, v in post.items()}
        B = batch["pixel_values"].shape[0]
        for j in range(B):
            # pad rows of a trailing partial multi-host batch (valid=False)
            # are duplicates — skip so each image is counted exactly once
            if "valid" in batch and not batch["valid"][j]:
                continue
            n_gt = int(batch["labels"]["num_boxes"][j])
            orig_hw = batch["orig_size"][j]
            gt_boxes_abs = rescale_boxes_np(
                batch["labels"]["boxes"][j, :n_gt], orig_hw)
            gt_classes = batch["labels"]["class_labels"][j, :n_gt]

            # detection is evaluated on every image, relations or not
            # (reference train_egtr.py:369-396)
            if coco is not None:
                h0, w0 = float(orig_hw[0]), float(orig_hw[1])
                det_boxes = post["det_boxes_norm"][j] * np.array(
                    [w0, h0, w0, h0])
                coco.update(
                    int(batch["image_id"][j]),
                    gt_boxes_abs, gt_classes + 1,
                    det_boxes, post["det_scores"][j],
                    post["det_labels"][j] + 1)
            n_img += 1

            if n_gt == 0:
                continue
            rel_dense = batch["labels"]["rel"][j, :n_gt, :n_gt]
            gt_rels = np.argwhere(rel_dense > 0)
            if len(gt_rels) == 0:
                continue
            gt_entry = {
                "gt_relations": gt_rels,
                "gt_boxes": gt_boxes_abs,
                "gt_classes": gt_classes,
            }
            pred_boxes_abs = rescale_boxes_np(post["pred_boxes"][j], orig_hw)
            if single is not None:
                entry = {
                    "pred_boxes": pred_boxes_abs,
                    "pred_classes": post["pred_classes"][j],
                    "obj_scores": post["obj_scores"][j],
                    "pred_rel_inds": post["single_inds"][j],
                    "rel_scores": post["single_rel_vec"][j],
                }
                single.evaluate_entry(gt_entry, entry)
                evaluate_per_predicate(gt_entry, entry, per_pred_single,
                                       rel_categories)
            if multiple is not None:
                entry = {
                    "pred_boxes": pred_boxes_abs,
                    "pred_classes": post["pred_classes"][j],
                    "obj_scores": post["obj_scores"][j],
                    "pred_rel_inds": post["mult_inds"][j],
                    "rel_scores": post["mult_rel_scores"][j],
                }
                multiple.evaluate_entry(gt_entry, entry)
                evaluate_per_predicate(gt_entry, entry, per_pred_multiple,
                                       rel_categories)
            if oi_evaluator is not None:
                Q = post["pred_classes"].shape[1]
                if _so_pairs.get("Q") != Q:
                    # all Q^2 (subject, object) index pairs, built once —
                    # the reference rebuilds this list per image
                    # (train_egtr.py:154-173)
                    grid = np.indices((Q, Q)).reshape(2, -1).T
                    _so_pairs.update(Q=Q, pairs=grid)
                so = _so_pairs["pairs"]
                R = cfg.num_rel_labels
                oi_evaluator(gt_entry, {
                    "pred_boxes": pred_boxes_abs,
                    "pred_classes": post["pred_classes"][j],
                    "obj_scores": post["obj_scores"][j],
                    "sbj_obj_inds": so,
                    "pred_scores": post["rel_full"][j].reshape(-1, R),
                })
        if max_images and n_img >= max_images:
            break

    # multi-host: merge per-image evaluator state from every host before
    # aggregating (reference pickle all_gather, util/misc.py:93-135)
    _merge_across_hosts([e for e in (single, multiple, coco, oi_evaluator)
                         if e is not None]
                        + (list(per_pred_single.values())
                           if per_pred_single else [])
                        + (list(per_pred_multiple.values())
                           if per_pred_multiple else []))

    metrics: Dict[str, float] = {}
    if single is not None:
        metrics.update({f"single/{k}": v
                        for k, v in single.aggregate().items()})
        per_pred = {n: e.aggregate() for n, e in per_pred_single.items()}
        metrics.update({f"single/{k}": v for k, v in evaluate_mean_recall(
            per_pred, len(rel_categories)).items()})
    if multiple is not None:
        metrics.update({f"multiple/{k}": v
                        for k, v in multiple.aggregate().items()})
        per_pred = {n: e.aggregate() for n, e in per_pred_multiple.items()}
        metrics.update({f"multiple/{k}": v for k, v in evaluate_mean_recall(
            per_pred, len(rel_categories)).items()})
    if coco is not None:
        metrics.update({f"coco/{k}": v for k, v in coco.summarize().items()})
    if oi_evaluator is not None:
        metrics.update({f"oi/{k}": v
                        for k, v in oi_evaluator.aggregate_metrics().items()})
    return metrics


def _merge_across_hosts(evaluators) -> None:
    """Fold every other host's evaluator state into the local evaluators.
    No-op in a single-process run."""
    import jax

    if jax.process_count() == 1:
        return
    from ..parallel.dist import all_gather_objects

    states = all_gather_objects([e.state() for e in evaluators])
    me = jax.process_index()
    for host, host_states in enumerate(states):
        if host == me:
            continue
        for e, s in zip(evaluators, host_states):
            e.merge_state(s)


def evaluate_detection(model, cfg, params, loader, *,
                       max_images: Optional[int] = None,
                       categories=None) -> Dict[str, float]:
    """COCO-protocol detection evaluation for the base detector — the
    end-of-pretraining eval of reference pretrain_detr.py:500-542."""
    import jax
    import jax.numpy as jnp

    from .coco_eval import CocoEvaluator
    from .postprocess import detection_postprocess, rescale_boxes_np

    @jax.jit
    def infer(params, pixel_values, pixel_mask):
        out = model.apply(params, pixel_values, pixel_mask,
                          deterministic=True)
        return detection_postprocess(
            out["logits"], out["pred_boxes"],
            jnp.ones((out["logits"].shape[0], 2), jnp.int32), top_k=100)

    coco = CocoEvaluator(sorted(categories) if categories is not None
                         else list(range(cfg.num_labels)))
    n_img = 0
    for batch in loader:
        det = infer(params, jnp.asarray(batch["pixel_values"]),
                    jnp.asarray(batch["pixel_mask"]))
        det = {k: np.asarray(v) for k, v in det.items()}
        B = batch["pixel_values"].shape[0]
        for j in range(B):
            if "valid" in batch and not batch["valid"][j]:
                continue
            n_gt = int(batch["labels"]["num_boxes"][j])
            orig_hw = batch["orig_size"][j]
            h0, w0 = float(orig_hw[0]), float(orig_hw[1])
            coco.update(
                int(batch["image_id"][j]),
                rescale_boxes_np(batch["labels"]["boxes"][j, :n_gt], orig_hw),
                batch["labels"]["class_labels"][j, :n_gt] + 1,
                det["boxes"][j] * np.array([w0, h0, w0, h0]),
                det["scores"][j], det["labels"][j] + 1)
            n_img += 1
        if max_images and n_img >= max_images:
            break
    _merge_across_hosts([coco])
    return {f"coco/{k}": v for k, v in coco.summarize().items()}


def write_metrics(metrics: Dict[str, float], path: str,
                  extra: Optional[dict] = None) -> None:
    """Dump the metrics JSON the reference writes next to the checkpoint
    (train_egtr.py:928-935). Process 0 only — post-merge metrics are
    identical on every host."""
    import jax

    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump({**metrics, **(extra or {})}, f, indent=2, default=float)
