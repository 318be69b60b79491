"""Full-model windowed-MSDA output deltas at the FPS-protocol shape
(608x1008), random init + directional-init offsets, CPU matmul path
(run with JAX_PLATFORMS=cpu). Produces ROADMAP's random-init accuracy
rows (query-tile row cap; band="point"); results:
experiments/win_deltas_random_init_cpu.json."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from egtr_tpu.config import EgtrConfig
from egtr_tpu.models.egtr import EgtrModel

H, W = 608, 1008
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)

base = EgtrConfig(num_queries=200, num_labels=150, num_rel_labels=50,
                  dropout=0.0, compute_dtype="bfloat16")
params = jax.jit(EgtrModel(base).init)(jax.random.PRNGKey(0), x)

KEYS = ("logits", "pred_rel", "pred_boxes", "pred_connectivity")


def run(cfg):
    m = EgtrModel(cfg)
    out = jax.jit(lambda p, v: m.apply(p, v, deterministic=True))(params, x)
    return {k: np.asarray(out[k], np.float64) for k in KEYS}


t0 = time.time()
exact = run(base)
print(f"exact done {time.time()-t0:.0f}s", flush=True)

report = {}
for name, kw in (
    ("win16_tile", dict(msda_window=16)),
    ("win16_point", dict(msda_window=16, msda_band="point")),
    ("win8_point", dict(msda_window=8, msda_band="point")),
):
    t0 = time.time()
    out = run(base.replace(**kw))
    row = {}
    for k in KEYS:
        d = np.abs(out[k] - exact[k])
        scale = float(np.abs(exact[k]).max()) or 1.0
        row[k] = {"max_abs": float(d.max()),
                  "max_rel_of_scale": float(d.max() / scale)}
    report[name] = row
    print(name, json.dumps(row), f"({time.time()-t0:.0f}s)", flush=True)

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/win_deltas_cpu.json"
with open(out, "w") as f:
    json.dump(report, f, indent=2)
print("done ->", out, flush=True)
