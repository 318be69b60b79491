"""Measure whether jax.export round-trips Mosaic (Pallas) custom calls on
this backend, and whether a deserialized program avoids the per-process
compile cost (utils/cache.py documents that the persistent compilation
cache does NOT cover Pallas programs over the axon tunnel).

Outcome feeds ROADMAP's compile-cost-mitigation section.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from egtr_tpu.ops.msda import ms_deform_attn

    shapes = ((76, 126), (38, 63), (19, 32), (10, 16))
    S = sum(h * w for h, w in shapes)
    B, H, D, L, P = 1, 8, 32, 4, 4
    Q = S
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P)), jnp.bfloat16)

    f = jax.jit(lambda v, l, a: ms_deform_attn(
        v, shapes, l, a, impl="pallas").sum())

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
        print(f"deserialize+first-call OK in {time.time()-t0:.1f}s",
              flush=True)
        t0 = time.time()
        np.asarray(rt.call(value, loc, aw))
        print(f"second call {time.time()-t0:.2f}s", flush=True)
    except Exception as e:
        print(f"ROUNDTRIP FAILED after {time.time()-t0:.1f}s: "
              f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
