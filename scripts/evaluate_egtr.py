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
    # inference-speed knobs (weight-free; override the artifact's config)
    p.add_argument("--msda_window", type=int, default=None,
                   help="banded MSDA window for this eval run (0 = exact)")
    p.add_argument("--msda_int8", type=str2bool, default=None)
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
    from egtr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from egtr_tpu.data.loader import Loader
    from egtr_tpu.evaluation.postprocess import sgg_postprocess
    from egtr_tpu.evaluation.runner import evaluate_sgg, write_metrics
    from egtr_tpu.models.egtr import EgtrModel

    cfg, params = load_artifact(args.artifact_path, args)
    if args.msda_window is not None:
        cfg = cfg.replace(msda_window=args.msda_window)
    if args.msda_int8 is not None:
        cfg = cfg.replace(msda_int8=args.msda_int8)
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

    loader = Loader(ds, args.batch_size, shuffle=False,
                    max_gt=cfg.max_gt_boxes,
                    num_rel_labels=cfg.num_rel_labels)

    if args.infer_only:
        # FPS protocol (evaluate_egtr.py:27-36): forward-only loop
        @jax.jit
        def infer(params, pixel_values, pixel_mask):
            out = model.apply(params, pixel_values, pixel_mask,
                              deterministic=True)
            return sgg_postprocess(
                out["logits"], out["pred_boxes"], out["pred_rel"],
                out["pred_connectivity"], num_labels=cfg.num_labels,
                top_k=100)

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

    metrics = evaluate_sgg(
        model, cfg, params, loader, rel_categories,
        eval_single_preds=args.eval_single_preds,
        eval_multiple_preds=args.eval_multiple_preds,
        coco_eval=args.coco_eval, oi_evaluator=oi,
        max_images=args.max_images,
        categories=(sorted(ds.categories.keys())
                    if hasattr(ds, "categories") else None))
    print(json.dumps(metrics, indent=2))
    out_path = os.path.join(os.path.dirname(args.artifact_path) or ".",
                            f"metrics_{args.split}.json")
    write_metrics(metrics, out_path, extra={"args": vars(args)})


if __name__ == "__main__":
    main()
