"""Profile the b1 FPS-protocol inference step on the real chip: device-op
breakdown by module and op kind, plus wall-clock strict/pipelined views.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_profile_infer.py
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--band", default="tile", choices=["tile", "point"])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trace-dir", default="/tmp/egtr_trace")
    args = ap.parse_args()

    from egtr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from bench import _build

    cfg_kw = {"msda_impl": "auto", "msda_window": args.window,
              "msda_band": args.band, "msda_int8": args.int8}
    params, x, infer = _build(cfg_kw, args.batch, 608, 1008)

    print("compiling...", flush=True)
    t0 = time.time()
    np.asarray(infer(params, x))
    print(f"compiled+first exec in {time.time() - t0:.1f}s", flush=True)

    # strict wall-clock (per image)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        np.asarray(infer(params, x))
    strict_ms = 1e3 * (time.perf_counter() - t0) / (args.iters * args.batch)

    # device-only: dispatch N then block once; the tunnel RTT amortizes
    t0 = time.perf_counter()
    outs = [infer(params, x) for _ in range(args.iters)]
    np.asarray(outs[-1])
    chained_ms = 1e3 * (time.perf_counter() - t0) / (args.iters * args.batch)

    from egtr_tpu.utils.profiling import device_trace, summarize_trace

    with device_trace(args.trace_dir):
        outs = [infer(params, x) for _ in range(args.iters)]
        np.asarray(outs[-1])
    s = summarize_trace(args.trace_dir, iterations=args.iters)
    print(json.dumps({
        "strict_ms_per_img": round(strict_ms, 2),
        "chained_ms_per_img": round(chained_ms, 2),
        "trace_total_ms": round(s["total_ms"], 2),
        "by_op": {k: round(v, 2) for k, v in s["by_op"].items()},
        "by_module": {k: round(v, 2) for k, v in
                      list(s["by_module"].items())[:14]},
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
