#!/usr/bin/env python
"""EGTR evaluation / FPS driver.

Mirror of the reference ``evaluate_egtr.py``: loads an artifact (config +
params; orbax-native or a converted torch checkpoint), runs the full VG/OI
evaluation (R@K, mR@K, optional COCO detection mAP) or the ``--infer_only``
FPS loop at 600/1000 (README.md:105-109).

TPU-native differences: eval batches are padded to static buckets so the
whole loop compiles once per bucket, and triplet top-k runs on device —
only ~100 triples per image reach the host.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.train_egtr import str2bool  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--dataset", choices=["visual_genome", "open_images"],
                   default="visual_genome")
    p.add_argument("--artifact_path", required=True)
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--num_queries", type=int, default=200)
    p.add_argument("--min_size", type=int, default=800)
    p.add_argument("--max_size", type=int, default=1333)
    p.add_argument("--infer_only", type=str2bool, default=False)
    p.add_argument("--eval_single_preds", type=str2bool, default=True)
    p.add_argument("--eval_multiple_preds", type=str2bool, default=False)
    p.add_argument("--coco_eval", type=str2bool, default=False)
    p.add_argument("--logit_adjustment", type=str2bool, default=False)
    p.add_argument("--logit_adj_tau", type=float, default=0.3)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--compute_dtype", default="bfloat16")
    return p.parse_args()


def load_artifact(path, args):
    """Load config+params from an orbax artifact dir or a torch .bin/.ckpt."""
    import numpy as np
    from egtr_tpu.config import EgtrConfig
    from egtr_tpu.train.checkpoint import load_pretrained
    from egtr_tpu.utils.convert import convert_detr_state_dict

    if os.path.isdir(path) and os.path.exists(
            os.path.join(path, "config.json")):
        cfg, params = load_pretrained(path)
    else:
        # torch checkpoint file
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=False)
        sd = raw.get("state_dict", raw)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        cfg_path = os.path.join(os.path.dirname(path), "config.json")
        cfg = EgtrConfig.load(cfg_path) if os.path.exists(cfg_path) \
            else EgtrConfig(num_queries=args.num_queries)
        params = convert_detr_state_dict(sd, cfg)
    cfg = cfg.replace(logit_adjustment=args.logit_adjustment,
                      logit_adj_tau=args.logit_adj_tau,
                      compute_dtype=args.compute_dtype,
                      dropout=0.0)
    return cfg, params


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from egtr_tpu.data.loader import Loader
    from egtr_tpu.evaluation.postprocess import (rescale_boxes_np,
                                                 sgg_postprocess)
    from egtr_tpu.evaluation.sg_eval import (SceneGraphEvaluator,
                                             evaluate_mean_recall)
    from egtr_tpu.models.egtr import EgtrModel

    cfg, params = load_artifact(args.artifact_path, args)
    model = EgtrModel(cfg)

    if args.dataset == "visual_genome":
        from egtr_tpu.data.visual_genome import VGDataset
        ds = VGDataset(args.data_path, args.split, size=args.min_size,
                       max_size=args.max_size)
        rel_categories = ds.rel_categories
        oi = None
    else:
        from egtr_tpu.data.open_images import OIDataset
        from egtr_tpu.evaluation.oi_eval import OIEvaluator
        ds = OIDataset(args.data_path, args.split, size=args.min_size,
                       max_size=args.max_size)
        rel_categories = ds.rel_categories
        oi = OIEvaluator(rel_categories, ds.ind_to_classes)

    need_full_rel = args.dataset == "open_images"

    @jax.jit
    def infer(params, pixel_values, pixel_mask):
        out = model.apply(params, pixel_values, pixel_mask,
                          deterministic=True)
        post = sgg_postprocess(
            out["logits"], out["pred_boxes"], out["pred_rel"],
            out["pred_connectivity"], num_labels=cfg.num_labels, top_k=100)
        if args.coco_eval:
            from egtr_tpu.evaluation.postprocess import detection_postprocess
            det = detection_postprocess(
                out["logits"], out["pred_boxes"],
                jnp.ones((out["logits"].shape[0], 2), jnp.int32), top_k=100)
            post["det_scores"] = det["scores"]
            post["det_labels"] = det["labels"]
            post["det_boxes_norm"] = det["boxes"]  # unit scale; rescale host-side
        if need_full_rel:
            # OI scores all Q^2 pairs (train_egtr.py:154-173) — ship the
            # full (clamped, connectivity-gated) relation tensor
            post["rel_full"] = (jnp.clip(out["pred_rel"], 0, 1)
                                * jnp.clip(out["pred_connectivity"], 0, 1))
        return post

    loader = Loader(ds, args.batch_size, shuffle=False,
                    max_gt=cfg.max_gt_boxes,
                    num_rel_labels=cfg.num_rel_labels)

    if args.infer_only:
        # FPS protocol (evaluate_egtr.py:27-36): forward-only loop
        n = 0
        t0 = None
        for batch in loader:
            post = infer(params, jnp.asarray(batch["pixel_values"]),
                         jnp.asarray(batch["pixel_mask"]))
            np.asarray(post["mult_inds"])
            n += batch["pixel_values"].shape[0]
            if t0 is None:
                t0 = time.perf_counter()  # skip compile
                n = 0
            if args.max_images and n >= args.max_images:
                break
        dt = time.perf_counter() - t0
        print(json.dumps({"fps": n / dt, "images": n}))
        return

    coco = None
    if args.coco_eval:
        from egtr_tpu.evaluation.coco_eval import CocoEvaluator
        # VG detection eval re-offsets category ids by +1
        # (lib/evaluation/coco_eval.py:44-45)
        coco = CocoEvaluator(sorted(ds.categories.keys())
                             if hasattr(ds, "categories")
                             else list(range(cfg.num_labels)))

    single = SceneGraphEvaluator(multiple_preds=False) \
        if args.eval_single_preds else None
    multiple = SceneGraphEvaluator(multiple_preds=True) \
        if args.eval_multiple_preds else None
    per_pred_single = {name: SceneGraphEvaluator(multiple_preds=False)
                       for name in rel_categories} \
        if args.eval_single_preds else None

    n_img = 0
    for batch in loader:
        post = infer(params, jnp.asarray(batch["pixel_values"]),
                     jnp.asarray(batch["pixel_mask"]))
        post = {k: np.asarray(v) for k, v in post.items()}
        B = batch["pixel_values"].shape[0]
        for j in range(B):
            n_gt = int(batch["labels"]["num_boxes"][j])
            if n_gt == 0:
                continue
            rel_dense = batch["labels"]["rel"][j, :n_gt, :n_gt]
            gt_rels = np.argwhere(rel_dense > 0)
            if len(gt_rels) == 0:
                continue
            orig_hw = batch["orig_size"][j]
            gt_entry = {
                "gt_relations": gt_rels,
                "gt_boxes": rescale_boxes_np(
                    batch["labels"]["boxes"][j, :n_gt], orig_hw),
                "gt_classes": batch["labels"]["class_labels"][j, :n_gt],
            }
            pred_boxes_abs = rescale_boxes_np(post["pred_boxes"][j], orig_hw)
            if coco is not None:
                h0, w0 = float(orig_hw[0]), float(orig_hw[1])
                det_boxes = post["det_boxes_norm"][j] * np.array(
                    [w0, h0, w0, h0])
                coco.update(
                    int(batch["image_id"][j]),
                    gt_entry["gt_boxes"],
                    gt_entry["gt_classes"] + 1,
                    det_boxes, post["det_scores"][j],
                    post["det_labels"][j] + 1)
            if single is not None:
                entry = {
                    "pred_boxes": pred_boxes_abs,
                    "pred_classes": post["pred_classes"][j],
                    "obj_scores": post["obj_scores"][j],
                    "pred_rel_inds": post["single_inds"][j],
                    "rel_scores": post["single_rel_vec"][j],
                }
                single.evaluate_entry(gt_entry, entry)
                for pred_id, name in enumerate(rel_categories):
                    mask = gt_rels[:, 2] == pred_id
                    if not mask.any():
                        continue
                    sub_gt = dict(gt_entry)
                    sub_gt["gt_relations"] = gt_rels[mask]
                    per_pred_single[name].evaluate_entry(sub_gt, entry)
            if multiple is not None:
                entry = {
                    "pred_boxes": pred_boxes_abs,
                    "pred_classes": post["pred_classes"][j],
                    "obj_scores": post["obj_scores"][j],
                    "pred_rel_inds": post["mult_inds"][j],
                    "rel_scores": post["mult_rel_scores"][j],
                }
                multiple.evaluate_entry(gt_entry, entry)
            if oi is not None:
                Q = post["pred_classes"].shape[1]
                so = np.array([(a, b) for a in range(Q) for b in range(Q)])
                R = cfg.num_rel_labels
                oi(gt_entry, {
                    "pred_boxes": pred_boxes_abs,
                    "pred_classes": post["pred_classes"][j],
                    "obj_scores": post["obj_scores"][j],
                    "sbj_obj_inds": so,
                    "pred_scores": post["rel_full"][j].reshape(-1, R),
                })
            n_img += 1
        if args.max_images and n_img >= args.max_images:
            break

    metrics = {}
    if single is not None:
        metrics.update({f"single/{k}": v
                        for k, v in single.aggregate().items()})
        per_pred = {n: e.aggregate() for n, e in per_pred_single.items()}
        metrics.update({f"single/{k}": v for k, v in evaluate_mean_recall(
            per_pred, len(rel_categories)).items()})
    if multiple is not None:
        metrics.update({f"multiple/{k}": v
                        for k, v in multiple.aggregate().items()})
    if coco is not None:
        metrics.update({f"coco/{k}": v for k, v in coco.summarize().items()})
    if oi is not None:
        metrics.update({f"oi/{k}": v
                        for k, v in oi.aggregate_metrics().items()})
    print(json.dumps(metrics, indent=2))
    out_path = os.path.join(os.path.dirname(args.artifact_path) or ".",
                            f"metrics_{args.split}.json")
    with open(out_path, "w") as f:
        json.dump({**metrics, "args": vars(args)}, f, indent=2)


if __name__ == "__main__":
    main()
