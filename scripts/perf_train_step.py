"""TPU probe: full-resolution EGTR training step (VERDICT item 4).

Runs the reference recipe shape — 800/1333 images (bucket 800x1344) — as a
real jitted train step (forward + backward + AdamW) on the chip and reports
step time. Round 1 OOM'd here at B=4 (177 GB of gather patch temporaries);
the Pallas MSDA path recomputes its hats in backward so activations are
O(inputs).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from egtr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--msda-impl", default="auto")
    ap.add_argument("--window", type=int, default=0,
                    help="banded-MSDA window (0 = exact)")
    ap.add_argument("--approx-topk", action="store_true",
                    help="approx_max_k hard-negative mining")
    ap.add_argument("--remat", type=lambda s: s != "0", default=False)
    ap.add_argument("--remat-policy", dest="remat_policy", default="full",
                    choices=["full", "dots"])
    ap.add_argument("--accum", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from egtr_tpu.config import EgtrConfig
    from egtr_tpu.models.egtr import EgtrModel
    from egtr_tpu.train.optim import make_optimizer
    from egtr_tpu.train.train_step import create_state, make_train_step

    print("backend:", jax.default_backend(), flush=True)
    cfg = EgtrConfig(num_queries=200, num_labels=150, num_rel_labels=50,
                     compute_dtype="bfloat16", use_remat=args.remat,
                     remat_policy=args.remat_policy,
                     msda_impl=args.msda_impl, msda_window=args.window,
                     rel_sample_approx_topk=args.approx_topk,
                     auxiliary_loss=True)
    model = EgtrModel(cfg)

    B, H, W = args.batch, args.height, args.width
    rng = np.random.default_rng(0)
    rel = np.zeros((B, cfg.max_gt_boxes, cfg.max_gt_boxes,
                    cfg.num_rel_labels), np.float32)
    rel[:, 0, 1, 1] = 1.0
    rel[:, 2, 3, 7] = 1.0
    batch = {
        "pixel_values": rng.standard_normal((B, H, W, 3)).astype(np.float32),
        "pixel_mask": np.ones((B, H, W), bool),
        "labels": {
            "class_labels": rng.integers(
                0, cfg.num_labels, (B, cfg.max_gt_boxes)).astype(np.int32),
            "boxes": rng.uniform(
                0.2, 0.7, (B, cfg.max_gt_boxes, 4)).astype(np.float32),
            "num_boxes": np.full((B,), 12, np.int32),
            "rel": rel,
        },
    }

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(batch["pixel_values"][:1]))
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f} M", flush=True)

    tx = make_optimizer(lr=2e-6, lr_backbone=2e-7, lr_initialized=2e-4)
    state = create_state(params, tx)
    step = make_train_step(model, cfg, tx, task="sgg",
                           accum_steps=args.accum)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["total_loss"])  # forces completion
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s "
          f"loss={loss:.3f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
        loss = float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step {H}x{W} B={B} accum={args.accum} remat={args.remat} "
          f"impl={args.msda_impl} window={args.window}: {dt*1000:.0f} ms/step "
          f"({B/dt:.2f} img/s) loss={loss:.3f} "
          f"grad_norm={float(metrics['grad_norm']):.3f}", flush=True)


if __name__ == "__main__":
    main()
