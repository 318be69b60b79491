"""jit-compiled train / eval steps with mesh sharding.

One compiled program per (bucket shape, phase): forward -> loss -> grad ->
clip -> AdamW update. Gradient accumulation runs as a ``lax.scan`` over
microbatches inside the same program (the reference's Lightning
``accumulate_grad_batches=2``, train_egtr.py:531,771). Data parallelism is
expressed by sharding the batch over the mesh ``data`` axis; XLA inserts the
gradient psum (the DDP all-reduce analog).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import EgtrConfig
from ..ops.criterion import detection_criterion, sgg_criterion


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model, cfg: EgtrConfig, tx,
                    task: str = "sgg", accum_steps: int = 1) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict with pixel_values [A*B,H,W,3], pixel_mask [A*B,H,W] and the
    padded labels pytree; with accum_steps=A the leading axis is split into A
    microbatches scanned sequentially (grads averaged).
    """
    criterion = sgg_criterion if task == "sgg" else detection_criterion

    def loss_fn(params, pixel_values, pixel_mask, labels, rng):
        drop_key, samp_key = jax.random.split(rng)
        out = model.apply(params, pixel_values, pixel_mask,
                          deterministic=False, rngs={"dropout": drop_key})
        if task == "sgg":
            total, losses = criterion(out, labels, cfg, train=True,
                                      rng=samp_key)
            # per-layer mean gate values logged as pseudo-losses
            # (egtr.py:496-505)
            for i in range(cfg.decoder_layers + 1):
                losses[f"rel_gate_{i}"] = out["rel_gate_mean"][i]
        else:
            total, losses = criterion(out, labels, cfg)
        return total, losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng, lr_scale=1.0):
        """``lr_scale`` is a TRACED scalar multiplying the optimizer
        updates — AdamW updates (incl. the decoupled weight decay) are
        linear in the learning rate, so scaling them equals scaling
        every param group's lr. The two-phase trainer's finetune phase
        (all LRs x0.1, train_egtr.py:790-870) passes 0.1 here and
        reuses the main phase's compiled program instead of recompiling
        with new lr constants.

        ``state`` is DONATED: without donation the old params+AdamW
        moments (~0.5 GB f32 at EGTR scale) stay live next to the new
        ones for the whole step, which is exactly the margin that OOMed
        the full-res B=4 recipe on a 16 GB chip. Callers must rebind
        (``state, m = train_step(state, ...)``) — all ours do."""
        if accum_steps == 1:
            (total, losses), grads = grad_fn(
                state.params, batch["pixel_values"], batch["pixel_mask"],
                batch["labels"], rng)
        else:
            def micro(carry, mb):
                acc, _ = carry
                (total, losses), grads = grad_fn(
                    state.params, mb["pixel_values"], mb["pixel_mask"],
                    mb["labels"], mb["rng"])
                acc = jax.tree.map(jnp.add, acc, grads)
                return (acc, (total, losses)), None

            def split_mb(x):
                return x.reshape(accum_steps, -1, *x.shape[1:])

            mbs = {
                "pixel_values": split_mb(batch["pixel_values"]),
                "pixel_mask": split_mb(batch["pixel_mask"]),
                "labels": jax.tree.map(split_mb, batch["labels"]),
                "rng": jax.random.split(rng, accum_steps),
            }
            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grads, (total, losses)), _ = _scan_accum(
                micro, zero, mbs, accum_steps)
            grads = jax.tree.map(lambda g: g / accum_steps, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def _scan_accum(micro, zero, mbs, accum_steps):
    """Python-unrolled accumulation (microbatch count is small and static;
    unrolling avoids carrying the loss pytree through scan).

    Metrics are averaged over microbatches, not last-wins: with accum=A the
    logged losses describe the full global batch, matching what the
    reference's Lightning loop logs for an accumulated step."""
    acc = zero
    total_sum = None
    losses_sum = None
    for a in range(accum_steps):
        mb = jax.tree.map(lambda x: x[a], mbs)
        (acc, (total, losses)), _ = micro((acc, None), mb)
        if total_sum is None:
            total_sum, losses_sum = total, losses
        else:
            total_sum = total_sum + total
            losses_sum = jax.tree.map(jnp.add, losses_sum, losses)
    total = total_sum / accum_steps
    losses = jax.tree.map(lambda x: x / accum_steps, losses_sum)
    return (acc, (total, losses)), None


def make_eval_step(model, cfg: EgtrConfig, task: str = "sgg") -> Callable:
    """eval_step(params, batch) -> (outputs, losses) without sampling."""

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch["pixel_values"], batch["pixel_mask"],
                          deterministic=True)
        if task == "sgg":
            total, losses = sgg_criterion(out, batch["labels"], cfg,
                                          train=False)
        else:
            total, losses = detection_criterion(out, batch["labels"], cfg)
        losses["total_loss"] = total
        return out, losses

    return eval_step
