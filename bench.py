"""Benchmark: EGTR single-image inference FPS at the reference FPS protocol.

Protocol (reference README.md:105-109, evaluate_egtr.py:27-36): batch 1,
shortest side 600 / max 1000, forward only. Baseline: ~14.5 img/s on one
V100 (EGTR paper efficiency table; BASELINE.md). Prints ONE JSON line.

The forward includes device-side top-k triplet extraction (the deployment
path) and forces a host fetch of the small top-k outputs each iteration so
the axon tunnel's lazy sync cannot fake timings.
"""

import argparse
import json
import time

import numpy as np

BASELINE_FPS = 14.5  # V100 reference (BASELINE.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--quick", action="store_true", help="5 iters")
    args = ap.parse_args()
    if args.quick:
        args.iters = 5

    import jax
    import jax.numpy as jnp
    from egtr_tpu.config import EgtrConfig
    from egtr_tpu.models.egtr import EgtrModel
    from egtr_tpu.evaluation.postprocess import sgg_postprocess

    cfg = EgtrConfig(num_queries=200, num_labels=150, num_rel_labels=50,
                     dropout=0.0, compute_dtype="bfloat16")
    model = EgtrModel(cfg)

    # FPS-protocol shape: 600x1000 -> bucket 608x1008 (static)
    H, W = 608, 1008
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def infer(params, pixel_values):
        out = model.apply(params, pixel_values, deterministic=True)
        post = sgg_postprocess(
            out["logits"], out["pred_boxes"], out["pred_rel"],
            out["pred_connectivity"], num_labels=cfg.num_labels, top_k=100)
        # pack every array a serving consumer needs into ONE host fetch
        # (each device->host round trip costs ~27ms over the tunnel)
        parts = [post["mult_inds"], post["mult_trip_scores"],
                 post["single_inds"], post["single_rel_vec"],
                 post["obj_scores"], post["pred_classes"],
                 post["pred_boxes"]]
        return jnp.concatenate(
            [p.astype(jnp.float32).reshape(-1) for p in parts])

    # warmup / compile
    for _ in range(max(args.warmup, 1)):
        np.asarray(infer(params, x))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        np.asarray(infer(params, x))  # single packed fetch (~30 KB)
    dt = (time.perf_counter() - t0) / args.iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "egtr_inference_fps_600x1000_b1",
        "value": round(fps, 3),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
