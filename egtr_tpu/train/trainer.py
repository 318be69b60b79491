"""Training loop: epochs, validation monitoring, early stopping, two-phase
schedule, resume — the TPU-native replacement for the reference's
PyTorch-Lightning Trainer wiring (train_egtr.py:762-877,
pretrain_detr.py:398-478).

- one compiled train step per bucket shape; metrics stream to JSONL
  (TensorBoardLogger analog),
- ``validation_loss`` = epoch mean of eval-mode total loss
  (train_egtr.py:339-348) drives checkpointing + EarlyStopping(patience=15),
- the finetune phase re-runs everything at 0.1x learning rates from the best
  main-phase checkpoint (train_egtr.py:790-870),
- relaunching with the same log_dir auto-resumes from the last checkpoint.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config import EgtrConfig
from ..parallel.mesh import replicate_state, shard_batch
from .checkpoint import CheckpointManager
from .optim import make_optimizer
from .train_step import (TrainState, create_state, make_eval_step,
                         make_train_step, split_microbatches)


class MetricLogger:
    """Append-only JSONL metric stream + console summary.

    Multi-host: only process 0 writes — every process computes identical
    metrics from the same global arrays, and concurrent appends to one
    file on shared storage would interleave corruptly."""

    def __init__(self, log_dir: str):
        self.primary = jax.process_index() == 0
        self.path = os.path.join(log_dir, "metrics.jsonl")
        if self.primary:
            os.makedirs(log_dir, exist_ok=True)

    def log(self, record: Dict) -> None:
        if not self.primary:
            return
        rec = {k: (float(v) if hasattr(v, "item") or isinstance(
            v, (int, float, np.floating)) else v) for k, v in record.items()}
        rec["time"] = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def _payload(state, best_val: float, epochs_no_improve: int, rng):
    """Checkpoint payload: train state + early-stop/rng loop state."""
    return {"state": state,
            "loop": {"best_val": np.asarray(best_val, np.float64),
                     "epochs_no_improve": np.asarray(epochs_no_improve,
                                                     np.int64),
                     "rng": np.asarray(rng)}}


def fit(model, cfg: EgtrConfig, *, train_loader, val_loader, log_dir: str,
        task: str = "sgg", lr: float = 2e-6, lr_backbone: float = 2e-7,
        lr_initialized: Optional[float] = 2e-4, weight_decay: float = 1e-4,
        grad_clip: float = 0.1, max_epochs: int = 50, patience: int = 15,
        accum_steps: int = 1, init_params=None, mesh=None, seed: int = 42,
        log_every: int = 50, lr_scale: float = 1.0,
        precompile: bool = False, initialized_paths=None) -> TrainState:
    """Run one training phase; returns the final state (best ckpt on disk).

    ``initialized_paths``: freshly-initialized param paths from
    ``merge_pretrained`` — they form the ``lr_initialized`` optimizer
    group (reference train_egtr.py:426-467); None keeps the legacy
    relation-head heuristic (see optim.param_label)."""
    logger = MetricLogger(log_dir)
    tx = make_optimizer(lr, lr_backbone, lr_initialized, weight_decay,
                        grad_clip, initialized_paths=initialized_paths)
    ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"))

    # EGTR_AOT_CACHE=1 warm-starts both programs from serialized
    # executables (utils/aot.py) — the only mechanism that skips XLA for
    # Pallas programs on backends whose persistent cache can't (axon);
    # no-op (identity) when disabled, non-jitted (accum>1), or multi-host
    from ..utils.aot import maybe_aot

    train_step = maybe_aot(make_train_step(model, cfg, tx, task=task,
                                           accum_steps=accum_steps),
                           tag=f"train_{task}")
    eval_step = maybe_aot(make_eval_step(model, cfg, task=task),
                          tag=f"eval_{task}")

    rng = jax.random.PRNGKey(seed)
    if init_params is None:
        # shape-only init from the loader's bucket bound: consuming
        # next(iter(loader)) here advanced the loader's epoch counter and
        # threw away a prefetch window of decoded batches, making epoch-0
        # order depend on whether init_params was passed
        rng, init_key = jax.random.split(rng)
        h, w = train_loader.init_shape
        init_params = model.init(
            init_key, jax.numpy.zeros((1, h, w, 3), jax.numpy.float32))
    state = create_state(init_params, tx)

    # checkpoint payload = train state + loop state, so a relaunch restores
    # early-stopping counters and the sampling RNG too (the reference's
    # Lightning resume restores trainer state, train_egtr.py:701-710)
    best_val = float("inf")
    epochs_no_improve = 0
    start_epoch = 0
    latest = ckpt.latest_step()
    if latest is not None:
        payload = ckpt.restore(_payload(state, best_val, epochs_no_improve,
                                        rng), latest)
        state = payload["state"]
        best_val = float(payload["loop"]["best_val"])
        epochs_no_improve = int(payload["loop"]["epochs_no_improve"])
        rng = jax.numpy.asarray(payload["loop"]["rng"])
        start_epoch = latest
        if jax.process_index() == 0:
            print(f"[trainer] resumed from epoch {latest} "
                  f"(best_val={best_val:.4f}, "
                  f"epochs_no_improve={epochs_no_improve})")

    if mesh is not None and jax.process_count() > 1:
        # params/opt_state are identical host-local arrays on every
        # process; a multi-process jit program needs GLOBAL (replicated)
        # arrays — plain host-local inputs cannot feed it
        state = TrainState(*replicate_state(tuple(state), mesh))

    if precompile and hasattr(val_loader, "dummy_batch") \
            and jax.process_count() == 1:
        # (single-process only: on a multi-host mesh, concurrent program
        # launches from a side thread could interleave differently per
        # host and deadlock the collectives)
        # Compile the eval program CONCURRENTLY with epoch-0 training
        # instead of serially at first validation. Startup compiles over
        # the axon tunnel are minutes per program and the persistent
        # cache does not cover Pallas/Mosaic custom calls (utils/cache.py)
        # — overlapping the two programs is the available mitigation.
        # jax tracing/compilation is thread-safe and releases the GIL
        # during the (remote) XLA compile, so this costs the train thread
        # almost nothing.
        import threading

        # capture shapes eagerly: train_step DONATES state, so by the time
        # the thread runs, the original param buffers may be deleted —
        # the jit cache keys on shapes/dtypes, so zeros warm it identically
        param_specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state.params)

        def _warm_eval():
            try:
                b = val_loader.dummy_batch()
                if mesh is not None:
                    b = shard_batch(b, mesh)
                zeros = jax.tree.map(
                    lambda s: jax.numpy.zeros(s.shape, s.dtype), param_specs)
                eval_step(zeros, b)
            except Exception as e:  # warming must never kill training
                # logged to the metrics stream, not just stdout: a typo'd
                # eval path silently reverting to serial compile should be
                # visible in the training record
                logger.log({"phase": "warn",
                            "message": f"precompile warm failed: {e}"})
                print(f"[trainer] precompile warm failed: {e}")

        threading.Thread(target=_warm_eval, daemon=True).start()

    for epoch in range(start_epoch, max_epochs):
        t0 = time.time()
        n_steps = 0
        for batch in train_loader:
            if accum_steps > 1:
                # split on host BEFORE sharding so every microbatch is
                # sharded over the full data axis (slicing an already
                # device-sharded batch would leave each microbatch on a
                # subset of devices)
                batch = split_microbatches(batch, accum_steps)
                if mesh is not None:
                    batch = [shard_batch(mb, mesh) for mb in batch]
            elif mesh is not None:
                batch = shard_batch(batch, mesh)
            rng, step_key = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_key, lr_scale)
            n_steps += 1
            if n_steps % log_every == 0:
                logger.log({"phase": "train", "epoch": epoch,
                            "step": int(state.step),
                            **{k: v for k, v in metrics.items()}})

        # validation: epoch-mean losses (train_egtr.py:339-348)
        val_sums: Dict[str, float] = {}
        val_n = 0
        for batch in val_loader:
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            _, losses = eval_step(state.params, batch)
            for k, v in losses.items():
                val_sums[k] = val_sums.get(k, 0.0) + float(v)
            val_n += 1
        val = {f"validation_{k}": v / max(val_n, 1)
               for k, v in val_sums.items()}
        val_loss = val.get("validation_total_loss", float("inf"))
        logger.log({"phase": "val", "epoch": epoch, **val,
                    "epoch_seconds": time.time() - t0})
        if jax.process_index() == 0:
            print(f"[trainer] epoch {epoch}: validation_loss={val_loss:.4f} "
                  f"({time.time() - t0:.0f}s, {n_steps} steps)")

        if val_loss < best_val:
            best_val = val_loss
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1

        ckpt.save(epoch + 1, _payload(state, best_val, epochs_no_improve,
                                      rng),
                  metrics={"validation_loss": val_loss})

        if epochs_no_improve >= patience:
            print(f"[trainer] early stop at epoch {epoch} "
                  f"(patience {patience})")
            break

    return state


def two_phase_fit(model, cfg: EgtrConfig, *, log_dir: str,
                  lr: float, lr_backbone: float,
                  lr_initialized: Optional[float],
                  max_epochs: int, max_epochs_finetune: int,
                  finetune_scale: float = 0.1, **kw) -> TrainState:
    """Main phase then finetune at scaled LRs from the best main checkpoint
    (train_egtr.py:790-870). The finetune phase reuses the main phase's
    compiled programs (traced lr_scale), so precompile overlap only
    matters once."""
    init_params = kw.pop("init_params", None)
    state = fit(model, cfg, log_dir=os.path.join(log_dir, "main"),
                lr=lr, lr_backbone=lr_backbone,
                lr_initialized=lr_initialized, max_epochs=max_epochs,
                init_params=init_params, **kw)

    # restore best main-phase params
    main_ckpt = CheckpointManager(os.path.join(log_dir, "main",
                                               "checkpoints"))
    best = main_ckpt.best_step()
    if best is not None:
        payload = main_ckpt.restore(
            _payload(state, float("inf"), 0, jax.random.PRNGKey(0)), best)
        state = payload["state"]
        print(f"[trainer] finetune from best main epoch {best}")
    else:
        import warnings

        warnings.warn(
            "two_phase_fit: no best main-phase checkpoint found (metrics "
            "missing from the checkpoint manager?); finetuning from the "
            "LAST main-phase state instead of the best one")

    # same base LRs + traced lr_scale -> the finetune phase reuses the
    # main phase's compiled train step (updates are linear in lr)
    state = fit(model, cfg, log_dir=os.path.join(log_dir, "finetune"),
                lr=lr, lr_backbone=lr_backbone,
                lr_initialized=lr_initialized, max_epochs=max_epochs_finetune,
                init_params=state.params, lr_scale=finetune_scale, **kw)
    return state
