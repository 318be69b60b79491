"""Measure whether AOT serialization can remove the per-process compile
cost of Pallas programs on this backend (utils/cache.py documents that the
persistent compilation cache does NOT cover Mosaic custom calls over the
axon tunnel; full-model compiles measured 576-2271 s).

Two candidate mechanisms, probed separately:

  --mode export      jax.export: StableHLO round-trip. Tests whether the
                     Mosaic custom calls SURVIVE serialization — but the
                     deserialized module still XLA-compiles at call time,
                     so this can only help if that compile hits the cache.
  --mode exec-save   jit(...).lower().compile() then
                     jax.experimental.serialize_executable — serializes
                     the COMPILED PJRT executable to --blob. This is the
                     only path that can skip compilation entirely.
  --mode exec-load   fresh process: deserialize_and_load(--blob) + call;
                     the wall time here IS the warm-start cost.

Outcome feeds ROADMAP's compile-cost-mitigation section.
"""

import argparse
import pickle
import time

import numpy as np


def _inputs():
    import jax.numpy as jnp

    shapes = ((76, 126), (38, 63), (19, 32), (10, 16))
    S = sum(h * w for h, w in shapes)
    B, H, D, L, P = 1, 8, 32, 4, 4
    Q = S
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P)), jnp.bfloat16)
    return shapes, value, loc, aw


def _fn(shapes):
    import jax

    from egtr_tpu.ops.msda import ms_deform_attn

    return jax.jit(lambda v, l, a: ms_deform_attn(
        v, shapes, l, a, impl="pallas").sum())


def mode_export():
    import jax
    from jax import export as jexport

    shapes, value, loc, aw = _inputs()
    f = _fn(shapes)
    t0 = time.time()
    try:
        exp = jexport.export(f)(value, loc, aw)
        blob = exp.serialize()
        print(f"export+serialize OK in {time.time()-t0:.1f}s, "
              f"{len(blob)/1e6:.2f} MB", flush=True)
    except Exception as e:
        print(f"EXPORT FAILED: {type(e).__name__}: {e}", flush=True)
        return

    t0 = time.time()
    try:
        rt = jexport.deserialize(blob)
        out = rt.call(value, loc, aw)
        np.asarray(out)
        print(f"deserialize+first-call OK in {time.time()-t0:.1f}s "
              "(includes the XLA compile of the deserialized module)",
              flush=True)
        t0 = time.time()
        np.asarray(rt.call(value, loc, aw))
        print(f"second call {time.time()-t0:.2f}s", flush=True)
    except Exception as e:
        print(f"ROUNDTRIP FAILED after {time.time()-t0:.1f}s: "
              f"{type(e).__name__}: {e}", flush=True)


def mode_exec_save(blob_path):
    from jax.experimental import serialize_executable

    shapes, value, loc, aw = _inputs()
    f = _fn(shapes)
    t0 = time.time()
    compiled = f.lower(value, loc, aw).compile()
    print(f"compile: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    np.asarray(compiled(value, loc, aw))
    print(f"first call: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    try:
        payload = serialize_executable.serialize(compiled)
        with open(blob_path, "wb") as fh:
            pickle.dump(payload, fh)
        print(f"serialize_executable OK in {time.time()-t0:.1f}s -> "
              f"{blob_path}", flush=True)
    except Exception as e:
        print(f"SERIALIZE FAILED: {type(e).__name__}: {e}", flush=True)


def mode_exec_load(blob_path):
    from jax.experimental import serialize_executable

    shapes, value, loc, aw = _inputs()
    t0 = time.time()
    try:
        with open(blob_path, "rb") as fh:
            payload = pickle.load(fh)
        compiled = serialize_executable.deserialize_and_load(*payload)
        print(f"deserialize_and_load: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        out = np.asarray(compiled(value, loc, aw))
        print(f"first call after load: {time.time()-t0:.1f}s "
              f"(finite={np.isfinite(out).all()})", flush=True)
    except Exception as e:
        print(f"EXEC LOAD FAILED after {time.time()-t0:.1f}s: "
              f"{type(e).__name__}: {e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["export", "exec-save", "exec-load"],
                    default="export")
    ap.add_argument("--blob", default="/tmp/msda_exec.blob")
    args = ap.parse_args()
    if args.mode == "export":
        mode_export()
    elif args.mode == "exec-save":
        mode_exec_save(args.blob)
    else:
        mode_exec_load(args.blob)


if __name__ == "__main__":
    main()
