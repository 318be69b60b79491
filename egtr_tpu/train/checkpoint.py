"""Orbax checkpointing with the reference's last/best semantics.

Reference behavior (train_egtr.py:701-710, 751-758, 887-890):
- ``last`` checkpoint every epoch -> auto-resume on relaunch,
- per-epoch checkpoints monitored on validation loss,
- "best" selection at test time = highest epoch number present (a quirk of
  the reference glob; we keep real best-by-metric AND record the epoch),
- config round-trips next to the weights (HF save_pretrained analog).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..config import EgtrConfig


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: -m.get("validation_loss", float("inf")),
                keep_checkpoints_without_metrics=True,
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             force: bool = False) -> None:
        self._mngr.save(
            step, args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
            force=force)
        self._mngr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()


def save_pretrained(directory: str, cfg: EgtrConfig, params: Any) -> None:
    """HF save_pretrained analog: config.json + params via orbax
    (pretrain_detr.py:480-490). Every process calls this (orbax
    coordinates the array write across hosts); the config JSON is
    written by process 0 only."""
    os.makedirs(directory, exist_ok=True)
    if jax.process_index() == 0:
        cfg.save(os.path.join(directory, "config.json"))
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), "params")
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_pretrained(directory: str, params_template: Any = None):
    """Returns (cfg, params). With a template, restores exact structure;
    without, rebuilds a template from the checkpoint's own metadata with
    the DEFAULT LOCAL device — a raw restore would replay the shardings
    recorded at save time, so an artifact written on the TPU backend
    could never be opened in a CPU process (and vice versa)."""
    cfg = EgtrConfig.load(os.path.join(directory, "config.json"))
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), "params")
    if params_template is not None:
        params = ckptr.restore(path, args=ocp.args.StandardRestore(
            params_template))
    else:
        from jax.sharding import SingleDeviceSharding

        meta = ckptr.metadata(path).item_metadata
        dev = jax.local_devices()[0]
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(
                m.shape, m.dtype, sharding=SingleDeviceSharding(dev)),
            meta)
        params = ckptr.restore(path, template)
    return cfg, params


def merge_pretrained(init_params: Any, loaded: Any):
    """from_pretrained with ignore_mismatched_sizes semantics
    (train_egtr.py:263-272): copy every leaf whose path+shape matches; keep
    the fresh init elsewhere. Returns (merged, initialized_key_paths)."""
    initialized = []

    def walk(init, load, path=()):
        if isinstance(init, dict):
            out = {}
            for k, v in init.items():
                if isinstance(load, dict) and k in load:
                    out[k] = walk(v, load[k], path + (k,))
                else:
                    initialized.append("/".join(path + (k,)))
                    out[k] = v
            return out
        # leaf
        if load is not None and getattr(load, "shape", None) == getattr(
                init, "shape", None) and load is not init:
            return jax.numpy.asarray(load, dtype=init.dtype) \
                if hasattr(init, "dtype") else load
        initialized.append("/".join(path))
        return init

    merged = walk(init_params, loaded)
    return merged, initialized
