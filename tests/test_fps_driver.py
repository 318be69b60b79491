"""The --infer_only FPS loop (scripts/evaluate_egtr.run_fps).

VERDICT r4 weak #5: the old loop set t0 only after the FIRST batch, so a
single-batch dataset (or --max_images <= batch) crashed or divided 0/0.
run_fps must handle any loader length >= 1 and report the decomposed
protocol JSON (fps / strict_sync / device_ms / rtt) like bench.py.
"""

import sys
import os

import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _batches(n, bsz=1):
    return [
        {"pixel_values": jnp.zeros((bsz, 8, 8, 3)),
         "pixel_mask": jnp.ones((bsz, 8, 8), bool)}
        for _ in range(n)
    ]


def _fake_infer(pv, pm):
    return {"mult_inds": pv.sum() * jnp.ones((pv.shape[0], 4), jnp.int32)}


def test_run_fps_single_batch():
    from evaluate_egtr import run_fps

    res = run_fps(_fake_infer, _batches(1), decomp_iters=2)
    assert res["images"] == 1
    for key in ("fps", "strict_sync_fps", "device_ms_per_image",
                "tunnel_rtt_ms"):
        assert res[key] > 0, res


def test_run_fps_max_images_and_counts():
    from evaluate_egtr import run_fps

    res = run_fps(_fake_infer, _batches(10, bsz=2), max_images=6,
                  decomp_iters=2)
    assert res["images"] == 6
    assert res["fps"] > 0


def test_run_fps_empty_loader_raises():
    from evaluate_egtr import run_fps

    with pytest.raises(SystemExit, match="no batches"):
        run_fps(_fake_infer, [], decomp_iters=1)
