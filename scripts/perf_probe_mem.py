"""Chipless HBM probe: compile the train step and print the planner's
memory analysis (no device execution — uses jit(...).lower().compile()).

Used to bisect full-res recipe OOMs: the 800x1344 B=4 accum=2 CLI default
sits within ~1 GB of the 15.75 GB v5e HBM, where layout/donation changes
flip it across the line. Run variants and compare `temp` sizes.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--labels", type=int, default=150)
    ap.add_argument("--rels", type=int, default=50)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--remat", type=lambda s: s != "0", default=False)
    ap.add_argument("--remat-policy", dest="remat_policy", default="full",
                    choices=["full", "dots"])
    ap.add_argument("--donate", type=lambda s: s != "0", default=True)
    ap.add_argument("--plain-stem", action="store_true")
    ap.add_argument("--max_gt_boxes", type=int, default=64)
    ap.add_argument("--max_gt_rels", type=int, default=192)
    ap.add_argument("--grad_clip", type=float, default=0.1)
    args = ap.parse_args()

    if args.plain_stem:
        os.environ["EGTR_PLAIN_STEM"] = "1"

    import jax
    import jax.numpy as jnp

    from egtr_tpu.config import EgtrConfig
    from egtr_tpu.models.egtr import EgtrModel
    from egtr_tpu.train.optim import make_optimizer
    from egtr_tpu.train.train_step import create_state, make_train_step

    cfg = EgtrConfig(num_queries=200, num_labels=args.labels,
                     num_rel_labels=args.rels, compute_dtype="bfloat16",
                     use_remat=args.remat, remat_policy=args.remat_policy,
                     auxiliary_loss=True,
                     max_gt_boxes=args.max_gt_boxes,
                     max_gt_rels=args.max_gt_rels)
    model = EgtrModel(cfg)

    B = args.batch * args.accum  # loader hands the full global batch
    H, W = args.height, args.width
    rng = np.random.default_rng(0)
    G = cfg.max_gt_boxes
    batch = {
        "pixel_values": jnp.zeros((B, H, W, 3), jnp.float32),
        "pixel_mask": jnp.ones((B, H, W), jnp.bool_),
        "labels": {
            "class_labels": jnp.zeros((B, G), jnp.int32),
            "boxes": jnp.asarray(rng.uniform(0.3, 0.6, (B, G, 4)),
                                 jnp.float32),
            "num_boxes": jnp.full((B,), 4, jnp.int32),
            "rel": jnp.zeros((B, G, G, cfg.num_rel_labels), jnp.float32),
        },
    }

    params = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    tx = make_optimizer(lr=2e-6, lr_backbone=2e-7, lr_initialized=2e-4,
                        grad_clip=args.grad_clip)
    state = create_state(params, tx)
    step = make_train_step(model, cfg, tx, task="sgg",
                           accum_steps=args.accum)

    print(f"variant: B={args.batch} accum={args.accum} remat={args.remat} "
          f"donate={args.donate} plain_stem={args.plain_stem} "
          f"labels={args.labels}", flush=True)

    if args.accum > 1:
        # the accumulated step is a Python loop over three inner programs
        # (train_step.py): probe the grad microbatch program and the
        # donated apply program — their max is the step's live peak
        from egtr_tpu.train.train_step import split_microbatches
        mb = split_microbatches(batch, args.accum)[0]
        grads_mb = step.grads_mb
        apply_fn = step.apply_grads if args.donate \
            else jax.jit(step.apply_grads.__wrapped__)
        acc_aval = jax.eval_shape(grads_mb, state.params, mb,
                                  jax.random.PRNGKey(1))
        acc = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), acc_aval)
        programs = [
            ("grads_mb", grads_mb, (state.params, mb, jax.random.PRNGKey(1))),
            ("apply", apply_fn, (state, acc)),
        ]
    else:
        step_fn = step if args.donate \
            else jax.jit(step.__wrapped__)  # re-jit without donate_argnums
        programs = [("step", step_fn,
                     (state, batch, jax.random.PRNGKey(1)))]

    gb = 1 / (1 << 30)
    for name, fn, fn_args in programs:
        lowered = fn.lower(*fn_args)
        try:
            compiled = lowered.compile()
        except Exception as e:
            msg = str(e)
            idx = msg.find("Ran out of memory")
            print(f"{name}: COMPILE OOM:" if idx >= 0
                  else f"{name}: COMPILE ERROR:",
                  msg[idx:idx + 200] if idx >= 0 else msg[:400])
            continue
        ma = compiled.memory_analysis()
        if ma is None:
            print(f"{name}: memory_analysis unavailable")
            continue
        print(f"{name}: temp={ma.temp_size_in_bytes*gb:.2f}G "
              f"args={ma.argument_size_in_bytes*gb:.2f}G "
              f"out={ma.output_size_in_bytes*gb:.2f}G "
              f"alias={ma.alias_size_in_bytes*gb:.2f}G "
              f"code={ma.generated_code_size_in_bytes*gb:.3f}G")


if __name__ == "__main__":
    main()
