"""TPU probe: correctness + timing of MSDA implementations at encoder scale.

Runs on the real chip (axon). Stage 1: tiny-shape parity pallas-vs-matmul
(fail fast on Mosaic lowering). Stage 2: FPS-protocol encoder shapes, time
each impl. Packs outputs into one fetch (27 ms/fetch tunnel cost).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="matmul,pallas")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd (training step shape)")
    ap.add_argument("--window", type=int, default=0,
                    help="banded window for stage 2 (0 = exact); "
                         "query_segments = the encoder shapes")
    ap.add_argument("--band", default="tile", choices=["tile", "point"])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch", type=int, default=1,
                    help="stage-2 batch size (serving-shape scaling)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from egtr_tpu.ops.msda import ms_deform_attn

    print("backend:", jax.default_backend(), flush=True)

    # ---- stage 1: tiny parity on-device ----
    if not args.skip_parity:
        rng = np.random.default_rng(0)
        shapes = ((12, 20), (6, 10))
        S = sum(h * w for h, w in shapes)
        B, Q, H, D, L, P = 1, 40, 8, 32, 2, 4
        value = rng.standard_normal((B, S, H, D)).astype(np.float32)
        loc = rng.uniform(-0.1, 1.1, (B, Q, H, L, P, 2)).astype(np.float32)
        aw = rng.uniform(0, 1, (B, Q, H, L, P)).astype(np.float32)

        outs = {}
        for impl in ["matmul", "pallas"]:
            f = jax.jit(lambda v, l, a, impl=impl: ms_deform_attn(
                v, shapes, l, a, impl=impl))
            outs[impl] = np.asarray(f(jnp.asarray(value), jnp.asarray(loc),
                                      jnp.asarray(aw)))
            print(f"parity fwd {impl}: ok", flush=True)
        err = np.abs(outs["pallas"] - outs["matmul"]).max()
        print(f"parity fwd pallas-vs-matmul max err: {err:.2e}", flush=True)
        assert err < 1e-4, err

        def loss(impl):
            def f(v, l, a):
                return (ms_deform_attn(v, shapes, l, a, impl=impl) ** 2).sum()
            return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

        gm = loss("matmul")(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))
        gp = loss("pallas")(jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw))
        for name, a, b in zip("v l a".split(), gm, gp):
            e = np.abs(np.asarray(a) - np.asarray(b)).max()
            scale = max(np.abs(np.asarray(a)).max(), 1.0)
            print(f"parity grad[{name}] max err: {e:.2e} (scale {scale:.1e})",
                  flush=True)
            assert e / scale < 1e-3, (name, e)
        print("PARITY OK", flush=True)

    # ---- stage 2: encoder-scale timing (608x1008 FPS bucket) ----
    shapes = ((76, 126), (38, 63), (19, 32), (10, 16))
    S = sum(h * w for h, w in shapes)
    B, H, D, L, P = args.batch, 8, 32, 4, 4
    Q = S
    rng = np.random.default_rng(1)
    value = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P, 2)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P)), jnp.bfloat16)

    wkw = {}
    if args.window:
        wkw = dict(window=args.window, query_segments=shapes,
                   band=args.band)
    if args.int8:
        wkw["int8"] = True

    def timed(fn, label):
        np.asarray(fn(value, loc, aw))  # compile + first exec
        t0 = time.perf_counter()
        for _ in range(args.iters):
            np.asarray(fn(value, loc, aw))
        dt = (time.perf_counter() - t0) / args.iters * 1000
        # chained: dispatch all iters, sync once — device time without
        # the per-iteration tunnel round trip (~27 ms)
        t0 = time.perf_counter()
        outs = [fn(value, loc, aw) for _ in range(args.iters)]
        np.asarray(outs[-1])
        dev = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{label}: {dt:.2f} ms/call fetched, {dev:.2f} ms/call "
              f"device-chained (x6 layers = {6*dev:.0f} ms)", flush=True)

    for impl in args.impls.split(","):
        f = jax.jit(lambda v, l, a, impl=impl: ms_deform_attn(
            v, shapes, l, a, impl=impl, **wkw).sum())
        timed(f, f"fwd {impl} win={args.window}")

        if args.grad:
            def gsum(v, l, a, impl=impl):
                gr = jax.grad(
                    lambda v_, l_, a_: ms_deform_attn(
                        v_, shapes, l_, a_, impl=impl, **wkw
                    ).astype(jnp.float32).sum(),
                    argnums=(0, 1, 2))(v, l, a)
                # one scalar fetch; see axon tunnel note in module docstring
                return sum(x.astype(jnp.float32).sum() for x in gr)

            timed(jax.jit(gsum), f"fwd+bwd {impl} win={args.window}")


if __name__ == "__main__":
    main()
