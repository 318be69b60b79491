#!/usr/bin/env python
"""Deformable-DETR detector pretraining driver.

Mirror of the reference ``pretrain_detr.py`` (defaults at
pretrain_detr.py:202-260): VG detection-only training at lr 1e-4 / 1e-5
with auxiliary per-layer losses, main + finetune(0.1x) phases, and an HF
save_pretrained-style export consumed by scripts/train_egtr.py --pretrained.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.train_egtr import str2bool  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--dataset", choices=["visual_genome", "open_images"],
                   default="visual_genome")
    p.add_argument("--output_path", required=True)
    p.add_argument("--num_queries", type=int, default=200)
    p.add_argument("--backbone_dirpath", default=None,
                   help="dir holding {backbone}.pt — a raw timm ResNet-50 "
                        "state dict loaded into the backbone before "
                        "pretraining (reference pretrain_detr.py:72-74)")
    p.add_argument("--auxiliary_loss", type=str2bool, default=True)
    p.add_argument("--ce_loss_coefficient", type=float, default=2.0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--accumulate", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_backbone", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--gradient_clip_val", type=float, default=0.1)
    p.add_argument("--max_epochs", type=int, default=150)
    p.add_argument("--max_epochs_finetune", type=int, default=50)
    p.add_argument("--patience", type=int, default=15)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--use_remat", type=str2bool, default=False)
    p.add_argument("--remat_policy", default="dots",
                   choices=["full", "dots"])
    p.add_argument("--max_gt_boxes", type=int, default=64)
    p.add_argument("--dp", type=int, default=None)
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
    from egtr_tpu.models.detr import DeformableDetrBase
    from egtr_tpu.parallel.mesh import make_mesh
    from egtr_tpu.train.checkpoint import save_pretrained
    from egtr_tpu.train.trainer import two_phase_fit

    if args.dataset == "visual_genome":
        from egtr_tpu.data.visual_genome import VGDataset
        # detector pretraining uses the crop augmentor (pretrain_detr.py:267)
        train_ds = VGDataset(args.data_path, "train", train_aug=True,
                             use_crop=True, debug=args.debug, seed=args.seed)
        val_ds = VGDataset(args.data_path, "val")
        num_labels = train_ds.num_classes()
        num_rel = len(train_ds.rel_categories)
    else:
        from egtr_tpu.data.open_images import OIDataset
        train_ds = OIDataset(args.data_path, "train", train_aug=True,
                             num_object_queries=args.num_queries,
                             debug=args.debug, seed=args.seed)
        val_ds = OIDataset(args.data_path, "val")
        num_labels = train_ds.num_classes()
        num_rel = len(train_ds.rel_categories)

    cfg = EgtrConfig(
        num_queries=args.num_queries, num_labels=num_labels,
        num_rel_labels=num_rel, auxiliary_loss=args.auxiliary_loss,
        ce_loss_coefficient=args.ce_loss_coefficient,
        max_gt_boxes=args.max_gt_boxes, compute_dtype=args.compute_dtype,
        use_remat=args.use_remat, remat_policy=args.remat_policy)

    mesh = make_mesh(dp=args.dp, mp=args.mp) if len(jax.devices()) > 1 \
        else None
    global_bs = args.batch_size * (mesh.shape["data"] if mesh else 1) \
        * args.accumulate
    train_loader = Loader(train_ds, global_bs, shuffle=True,
                          max_gt=cfg.max_gt_boxes, num_rel_labels=num_rel,
                          drop_last=True, seed=args.seed,
                          num_workers=args.num_workers,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())
    val_loader = Loader(val_ds, global_bs // args.accumulate, shuffle=False,
                        max_gt=cfg.max_gt_boxes, num_rel_labels=num_rel,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    model = DeformableDetrBase(cfg)

    init_params = None
    if args.backbone_dirpath:
        # ImageNet backbone bootstrap (reference pretrain_detr.py:72-74)
        import jax.numpy as jnp
        import torch

        from egtr_tpu.train.checkpoint import merge_pretrained
        from egtr_tpu.utils.convert import convert_backbone_state_dict

        sd = torch.load(os.path.join(args.backbone_dirpath,
                                     f"{cfg.backbone}.pt"),
                        map_location="cpu", weights_only=False)
        sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
              for k, v in sd.items()}
        h, w = train_loader.init_shape
        init_params = jax.jit(model.init)(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((1, h, w, 3), jnp.float32))
        init_params, _ = merge_pretrained(
            init_params, convert_backbone_state_dict(sd, root=("backbone",)))
        print(f"[pretrain_detr] loaded backbone weights from "
              f"{args.backbone_dirpath}")

    state = two_phase_fit(
        model, cfg, log_dir=args.output_path,
        train_loader=train_loader, val_loader=val_loader,
        init_params=init_params,
        lr=args.lr, lr_backbone=args.lr_backbone, lr_initialized=None,
        weight_decay=args.weight_decay, grad_clip=args.gradient_clip_val,
        max_epochs=args.max_epochs,
        max_epochs_finetune=args.max_epochs_finetune,
        patience=args.patience, accum_steps=args.accumulate,
        mesh=mesh, seed=args.seed, task="detection",
        precompile=args.precompile)

    # export for train_egtr --pretrained (pretrain_detr.py:480-490);
    # wrap under the EGTR base-model scope so merge_pretrained aligns paths
    params = {"params": {"model": state.params["params"]}} \
        if "model" not in state.params["params"] else state.params
    save_pretrained(os.path.join(args.output_path, "artifact"), cfg, params)
    print("[pretrain_detr] artifact saved")

    # end-of-pretraining detection eval + JSON (pretrain_detr.py:500-542)
    from egtr_tpu.evaluation.runner import evaluate_detection, write_metrics

    if args.dataset == "visual_genome":
        test_ds = VGDataset(args.data_path, "test", size=800, max_size=1333)
    else:
        test_ds = OIDataset(args.data_path, "test", size=800, max_size=1333)
    test_loader = Loader(test_ds, jax.process_count(), shuffle=False,
                         max_gt=cfg.max_gt_boxes, num_rel_labels=num_rel,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
    eval_cfg = cfg.replace(dropout=0.0)
    metrics = evaluate_detection(
        DeformableDetrBase(eval_cfg), eval_cfg, state.params, test_loader,
        categories=(sorted(test_ds.categories.keys())
                    if hasattr(test_ds, "categories") else None))
    write_metrics(metrics,
                  os.path.join(args.output_path, "metrics_test.json"))
    print("[pretrain_detr] done; test metrics written")


if __name__ == "__main__":
    main()
