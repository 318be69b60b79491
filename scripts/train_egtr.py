#!/usr/bin/env python
"""EGTR scene-graph training driver.

TPU-native mirror of the reference ``train_egtr.py`` (argparse surface,
defaults, and two-phase schedule from train_egtr.py:488-569,762-877):
dataset + fg_matrix -> pretrained detector -> EGTR fine-tune at
lr 2e-6 / 2e-7 / 2e-4 with grad accumulation and early stopping, then a
finetune phase at 0.1x, then end-of-training evaluation.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def parse_args():
    p = argparse.ArgumentParser()
    # architecture / data (train_egtr.py:489-528)
    p.add_argument("--data_path", required=True)
    p.add_argument("--dataset", choices=["visual_genome", "open_images"],
                   default="visual_genome")
    p.add_argument("--output_path", required=True)
    p.add_argument("--pretrained", default=None,
                   help="path to a save_pretrained detector artifact")
    p.add_argument("--from_scratch", type=str2bool, default=False)
    p.add_argument("--backbone_dirpath", default=None,
                   help="dir holding {backbone}.pt — a raw timm ResNet-50 "
                        "state dict loaded into model.backbone when "
                        "training from scratch (reference "
                        "train_egtr.py:255-260)")
    p.add_argument("--num_queries", type=int, default=200)
    p.add_argument("--auxiliary_loss", type=str2bool, default=False)
    # loss coefficients (train_egtr.py:514-527)
    p.add_argument("--ce_loss_coefficient", type=float, default=2.0)
    p.add_argument("--rel_loss_coefficient", type=float, default=15.0)
    p.add_argument("--connectivity_loss_coefficient", type=float, default=30.0)
    p.add_argument("--smoothing", type=float, default=1e-14)
    p.add_argument("--rel_sample_negatives", type=int, default=80)
    p.add_argument("--rel_sample_nonmatching", type=int, default=80)
    p.add_argument("--rel_sample_negatives_largest", type=str2bool,
                   default=True)
    p.add_argument("--rel_sample_nonmatching_largest", type=str2bool,
                   default=True)
    p.add_argument("--use_freq_bias", type=str2bool, default=True)
    p.add_argument("--use_log_softmax", type=str2bool, default=False)
    p.add_argument("--freq_bias_eps", type=float, default=1e-12)
    p.add_argument("--logit_adjustment", type=str2bool, default=False)
    p.add_argument("--logit_adj_tau", type=float, default=0.3)
    p.add_argument("--filter_duplicate_rels", type=str2bool, default=True)
    p.add_argument("--filter_multiple_rels", type=str2bool, default=True)
    # optimization (train_egtr.py:529-539)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--accumulate", type=int, default=2)
    p.add_argument("--lr", type=float, default=2e-6)
    p.add_argument("--lr_backbone", type=float, default=2e-7)
    p.add_argument("--lr_initialized", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--gradient_clip_val", type=float, default=0.1)
    p.add_argument("--max_epochs", type=int, default=50)
    p.add_argument("--max_epochs_finetune", type=int, default=25)
    p.add_argument("--patience", type=int, default=15)
    # TPU-native knobs
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--use_remat", type=str2bool, default=False)
    p.add_argument("--remat_policy", default="dots",
                   choices=["full", "dots"])
    # opt-in approximate-MSDA training speedups (exact by default; the
    # banded train step measured 1.87x vs exact at full-res B=2 —
    # ROADMAP "Banded windowed BACKWARD")
    p.add_argument("--msda_window", type=int, default=0,
                   help="banded MSDA window (0 = exact)")
    p.add_argument("--msda_band", default="tile",
                   choices=["tile", "point"],
                   help="band granularity: per query tile or per "
                        "sampling point (more accurate, same MXU cost)")
    p.add_argument("--msda_int8", type=str2bool, default=False)
    p.add_argument("--max_gt_boxes", type=int, default=64)
    p.add_argument("--max_gt_rels", type=int, default=192)
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel size (default: all devices)")
    p.add_argument("--mp", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--debug", type=str2bool, default=False)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--precompile", type=str2bool, default=True,
                   help="compile the eval program concurrently with "
                        "epoch-0 training (single-process only)")
    return p.parse_args()


def main():
    from egtr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = parse_args()
    import jax

    from egtr_tpu.config import EgtrConfig
    from egtr_tpu.data.loader import Loader
    from egtr_tpu.models.egtr import EgtrModel, compute_freq_dists
    from egtr_tpu.parallel.mesh import make_mesh
    from egtr_tpu.train.checkpoint import (load_pretrained, merge_pretrained,
                                           save_pretrained)
    from egtr_tpu.train.trainer import two_phase_fit

    if args.dataset == "visual_genome":
        from egtr_tpu.data.visual_genome import VGDataset, vg_get_statistics
        train_ds = VGDataset(args.data_path, "train", train_aug=True,
                             debug=args.debug, seed=args.seed)
        val_ds = VGDataset(args.data_path, "val")
        fg_matrix = vg_get_statistics(train_ds)
        num_labels = train_ds.num_classes()
        num_rel = len(train_ds.rel_categories)
    else:
        from egtr_tpu.data.open_images import OIDataset, oi_get_statistics
        train_ds = OIDataset(
            args.data_path, "train", train_aug=True,
            filter_duplicate_rels=args.filter_duplicate_rels,
            filter_multiple_rels=args.filter_multiple_rels,
            num_object_queries=args.num_queries, debug=args.debug,
            seed=args.seed)
        val_ds = OIDataset(args.data_path, "val")
        fg_matrix = oi_get_statistics(train_ds)
        num_labels = train_ds.num_classes()
        num_rel = len(train_ds.rel_categories)

    cfg = EgtrConfig(
        num_queries=args.num_queries, num_labels=num_labels,
        num_rel_labels=num_rel, auxiliary_loss=args.auxiliary_loss,
        ce_loss_coefficient=args.ce_loss_coefficient,
        rel_loss_coefficient=args.rel_loss_coefficient,
        connectivity_loss_coefficient=args.connectivity_loss_coefficient,
        smoothing=args.smoothing,
        rel_sample_negatives=args.rel_sample_negatives,
        rel_sample_nonmatching=args.rel_sample_nonmatching,
        rel_sample_negatives_largest=args.rel_sample_negatives_largest,
        rel_sample_nonmatching_largest=args.rel_sample_nonmatching_largest,
        use_freq_bias=args.use_freq_bias,
        use_log_softmax=args.use_log_softmax,
        freq_bias_eps=args.freq_bias_eps,
        logit_adjustment=args.logit_adjustment,
        logit_adj_tau=args.logit_adj_tau,
        max_gt_boxes=args.max_gt_boxes, max_gt_rels=args.max_gt_rels,
        compute_dtype=args.compute_dtype, use_remat=args.use_remat,
        remat_policy=args.remat_policy, msda_window=args.msda_window,
        msda_band=args.msda_band, msda_int8=args.msda_int8)

    mesh = make_mesh(dp=args.dp, mp=args.mp) if len(jax.devices()) > 1 \
        else None
    global_bs = args.batch_size * (mesh.shape["data"] if mesh else 1) \
        * args.accumulate

    train_loader = Loader(train_ds, global_bs, shuffle=True,
                          max_gt=cfg.max_gt_boxes, drop_last=True,
                          num_rel_labels=num_rel, seed=args.seed,
                          num_workers=args.num_workers,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())
    # val is host-sharded like train (each host loads its slice; losses are
    # computed on the assembled global batch) — without this every host
    # would re-evaluate the full split, x process_count redundant work
    val_loader = Loader(val_ds, global_bs // args.accumulate, shuffle=False,
                        max_gt=cfg.max_gt_boxes, num_rel_labels=num_rel,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    model = EgtrModel(cfg)
    rng = jax.random.PRNGKey(args.seed)
    init_h, init_w = train_loader.init_shape
    init_params = jax.jit(model.init)(
        rng, jax.numpy.zeros((1, init_h, init_w, 3), jax.numpy.float32))

    # frequency-bias buffers from train statistics (egtr.py:169-194)
    rel_dist, triplet_dist = compute_freq_dists(
        fg_matrix, cfg.freq_bias_eps, cfg.use_log_softmax)
    init_params["params"]["rel_dist"] = rel_dist
    init_params["params"]["triplet_dist"] = triplet_dist

    # the lr_initialized optimizer group is exactly the set of freshly
    # initialized paths from the pretrained merge (reference
    # train_egtr.py:263-272,426-467); from scratch there is no such group
    initialized = []
    if args.from_scratch:
        if args.backbone_dirpath:
            # reference from_scratch bootstrap: raw timm ResNet-50 weights
            # into model.backbone (train_egtr.py:255-260); everything else
            # stays freshly initialized and initialized_keys stays []
            import torch

            from egtr_tpu.utils.convert import convert_backbone_state_dict

            sd = torch.load(os.path.join(args.backbone_dirpath,
                                         f"{cfg.backbone}.pt"),
                            map_location="cpu", weights_only=False)
            sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
                  for k, v in sd.items()}
            init_params, _ = merge_pretrained(
                init_params, convert_backbone_state_dict(sd))
            print("[train_egtr] loaded backbone weights from "
                  f"{args.backbone_dirpath}")
    elif args.pretrained:
        _, loaded = load_pretrained(args.pretrained)
        init_params, initialized = merge_pretrained(init_params, loaded)
        print(f"[train_egtr] loaded pretrained detector; "
              f"{len(initialized)} freshly initialized param paths")

    state = two_phase_fit(
        model, cfg, log_dir=args.output_path,
        train_loader=train_loader, val_loader=val_loader,
        lr=args.lr, lr_backbone=args.lr_backbone,
        lr_initialized=args.lr_initialized,
        weight_decay=args.weight_decay, grad_clip=args.gradient_clip_val,
        max_epochs=args.max_epochs,
        max_epochs_finetune=args.max_epochs_finetune,
        patience=args.patience, accum_steps=args.accumulate,
        init_params=init_params, mesh=mesh, seed=args.seed, task="sgg",
        precompile=args.precompile, initialized_paths=initialized)

    save_pretrained(os.path.join(args.output_path, "artifact"), cfg,
                    state.params)
    print("[train_egtr] artifact saved")

    # end-of-training test evaluation + metrics JSON next to the artifact
    # (reference train_egtr.py:879-935)
    from egtr_tpu.evaluation.runner import evaluate_sgg, write_metrics

    if args.dataset == "visual_genome":
        test_ds = VGDataset(args.data_path, "test", size=800, max_size=1333)
        oi = None
    else:
        from egtr_tpu.evaluation.oi_eval import OIEvaluator
        test_ds = OIDataset(args.data_path, "test", size=800, max_size=1333)
        oi = OIEvaluator(test_ds.rel_categories, test_ds.ind_to_classes)
    # one image per host per step; evaluator state merges across hosts
    test_loader = Loader(test_ds, jax.process_count(), shuffle=False,
                         max_gt=cfg.max_gt_boxes, num_rel_labels=num_rel,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
    eval_cfg = cfg.replace(dropout=0.0)
    metrics = evaluate_sgg(EgtrModel(eval_cfg), eval_cfg, state.params,
                           test_loader, test_ds.rel_categories,
                           coco_eval=(args.dataset == "visual_genome"),
                           oi_evaluator=oi,
                           categories=(sorted(test_ds.categories.keys())
                                       if hasattr(test_ds, "categories")
                                       else None))
    write_metrics(metrics,
                  os.path.join(args.output_path, "metrics_test.json"))
    print("[train_egtr] done; test metrics written")


if __name__ == "__main__":
    main()
