"""True multi-controller tests: two OS processes, gloo collectives, 8
global CPU devices.

Single-process multi-device meshes are fully addressable, so they cannot
catch host-slicing bugs (a device_put of a host-local slice silently
becomes "the global array"). These tests launch tests/mp_worker.py twice
under jax.distributed and compare against single-process ground truth
computed in this process (VERDICT r2 next #1).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_procs(scenario, outdir, timeout=900):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # workers pin platform/devices via jax.config inside the script
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"), scenario,
             str(pid), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"p{pid}.json")) as f:
            results.append(json.load(f))
    return results


def _sha(arr):
    import hashlib

    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def test_two_process_global_batch_assembly(tmp_path):
    """The assembled global batch must equal the single-host loader's
    batch bit-for-bit (incl. the padded+masked trailing partial batch)."""
    sys.path.insert(0, HERE)
    try:
        from mp_worker import make_dataset
    finally:
        sys.path.pop(0)
    from egtr_tpu.data.loader import Loader

    results = _run_two_procs("batch_assembly", str(tmp_path))
    # both processes must see the identical assembled global stream
    assert results[0] == results[1]

    # single-host ground truth over the same dataset/seed
    ref = Loader(make_dataset(), batch_size=4, shuffle=True, max_gt=4,
                 num_rel_labels=4, buckets=((48, 64),), seed=11, prefetch=0)
    ref_batches = list(ref)
    got = results[0]["batches"]
    # 10 samples / batch 4 -> 2 full + 1 partial(2): the partial tail is
    # padded to 4 with valid=[1,1,0,0] on BOTH single- and multi-host
    # loaders (round 4: unconditional padding keeps eval shapes static)
    assert len(got) == len(ref_batches) == 3
    for k, (g, r) in enumerate(zip(got, ref_batches)):
        nv = int(np.sum(g["valid"]))
        assert g["valid"] == r["valid"].tolist()
        assert g["image_id"][:nv] == r["image_id"][:nv].tolist()
        # bit-exact pixel/label content, not just ids
        assert g["pixel_sha"] == _sha(r["pixel_values"])
        assert g["labels_sha"] == _sha(r["labels"]["class_labels"])
        assert g["boxes_sha"] == _sha(r["labels"]["boxes"])
        if k < 2:
            assert g["valid"] == [True] * 4
        else:
            assert g["valid"] == [True, True, False, False]
            # pad rows repeat the last valid image
            assert g["image_id"][2:] == [g["image_id"][1]] * 2


def test_two_process_train_step_matches_single_process(tmp_path):
    """One train step on a 2-process mesh must reproduce the single-process
    8-device metrics on the same global batch; orbax save/restore must
    round-trip under coordinated multi-process writes."""
    sys.path.insert(0, HERE)
    try:
        from mp_worker import make_dataset
    finally:
        sys.path.pop(0)
    import jax.numpy as jnp

    from egtr_tpu.config import EgtrConfig
    from egtr_tpu.data.loader import Loader
    from egtr_tpu.models.egtr import EgtrModel
    from egtr_tpu.parallel.mesh import make_mesh, shard_batch
    from egtr_tpu.train.optim import make_optimizer
    from egtr_tpu.train.train_step import create_state, make_train_step

    results = _run_two_procs("train_parity", str(tmp_path))
    assert results[0]["ckpt_roundtrip"] and results[1]["ckpt_roundtrip"]
    m0, m1 = results[0]["metrics"], results[1]["metrics"]
    assert m0 == m1  # every process computes the same global metrics

    # single-process ground truth: same model/init/batch on this process's
    # 8 virtual devices
    cfg = EgtrConfig(
        d_model=64, encoder_layers=1, decoder_layers=2, encoder_ffn_dim=64,
        decoder_ffn_dim=64, num_queries=8, num_labels=5, num_rel_labels=4,
        max_gt_boxes=4, max_gt_rels=4, dropout=0.0)
    model = EgtrModel(cfg)
    mesh = make_mesh(dp=8, mp=1)
    loader = Loader(make_dataset(8, (48, 64)), batch_size=8, shuffle=False,
                    max_gt=4, num_rel_labels=4, buckets=((48, 64),),
                    prefetch=0)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 48, 64, 3), jnp.float32))
    tx = make_optimizer(lr=1e-3, lr_backbone=1e-4, lr_initialized=1e-3)
    state = create_state(params, tx)
    step = make_train_step(model, cfg, tx)
    _, metrics = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(1))

    for k in ("total_loss", "loss_ce", "loss_bbox", "loss_rel", "grad_norm"):
        np.testing.assert_allclose(m0[k], float(metrics[k]), rtol=2e-5,
                                   err_msg=k)


def test_two_process_accum_windowed_matches_single_process(tmp_path):
    """Production-recipe composition (VERDICT r4 next #4): 2 REAL
    processes x accum=2 x banded window-16 per-point pallas MSDA
    (interpret mode on CPU) must reproduce the single-process accumulated
    metrics on the same global batch, with a coordinated orbax
    round-trip. This is the stride-split microbatch +
    make_array_from_process_local_data + banded-kernel shard_map
    composition that the full reference recipe
    (train_egtr.py:530-539,770-783) runs in production."""
    sys.path.insert(0, HERE)
    try:
        from mp_worker import accum_windowed_cfg, make_dataset
    finally:
        sys.path.pop(0)
    import jax.numpy as jnp

    from egtr_tpu.data.loader import Loader
    from egtr_tpu.models.egtr import EgtrModel
    from egtr_tpu.parallel.mesh import make_mesh, shard_batch
    from egtr_tpu.train.optim import make_optimizer
    from egtr_tpu.train.train_step import (create_state, make_train_step,
                                           split_microbatches)

    results = _run_two_procs("train_accum_windowed", str(tmp_path),
                             timeout=1500)
    assert results[0]["ckpt_roundtrip"] and results[1]["ckpt_roundtrip"]
    m0, m1 = results[0]["metrics"], results[1]["metrics"]
    assert m0 == m1

    cfg = accum_windowed_cfg()
    model = EgtrModel(cfg)
    mesh = make_mesh(dp=8, mp=1)
    loader = Loader(make_dataset(16, (144, 64)), batch_size=16,
                    shuffle=False, max_gt=4, num_rel_labels=4,
                    buckets=((144, 64),), prefetch=0)
    batch = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 144, 64, 3), jnp.float32))
    tx = make_optimizer(lr=1e-3, lr_backbone=1e-4, lr_initialized=1e-3)
    state = create_state(params, tx)
    step = make_train_step(model, cfg, tx, accum_steps=2)
    mbs = [shard_batch(mb, mesh) for mb in split_microbatches(batch, 2)]
    _, metrics = step(state, mbs, jax.random.PRNGKey(1))

    for k in ("total_loss", "loss_ce", "loss_bbox", "loss_rel", "grad_norm"):
        np.testing.assert_allclose(m0[k], float(metrics[k]), rtol=2e-5,
                                   err_msg=k)
