"""jit-compiled train / eval steps with mesh sharding.

One compiled program per (bucket shape, phase): forward -> loss -> grad ->
clip -> AdamW update. Gradient accumulation (the reference's Lightning
``accumulate_grad_batches=2``, train_egtr.py:531,771) runs as a Python loop
of per-microbatch grad programs plus a donated accumulate/apply pair — NOT
one fused program: fusing the unrolled microbatches into a single jit was
measured 2.9 GB *larger* than the single-microbatch step (16.44 vs
13.51 GB temps at 800x1344 B=4, OOM on a 16 GB v5e), because XLA keeps the
whole unrolled schedule's buffers live. Multi-dispatch bounds peak HBM at
one microbatch's footprint for any accumulation depth; the extra dispatch
latency is noise against a multi-second full-res step. Data parallelism is
expressed by sharding the batch over the mesh ``data`` axis; XLA inserts
the gradient psum (the DDP all-reduce analog).
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

    def loss_fn(params, pixel_values, pixel_mask, labels, rng, valid=None):
        drop_key, samp_key = jax.random.split(rng)
        out = model.apply(params, pixel_values, pixel_mask,
                          deterministic=False, rngs={"dropout": drop_key})
        if task == "sgg":
            total, losses = criterion(out, labels, cfg, train=True,
                                      rng=samp_key, valid=valid)
            # per-layer mean gate values logged as pseudo-losses
            # (egtr.py:496-505)
            for i in range(cfg.decoder_layers + 1):
                losses[f"rel_gate_{i}"] = out["rel_gate_mean"][i]
        else:
            total, losses = criterion(out, labels, cfg, valid=valid)
        return total, losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _update(state, grads, total, losses, lr_scale):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step_single(state: TrainState, batch, rng, lr_scale=1.0):
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
        (total, losses), grads = grad_fn(
            state.params, batch["pixel_values"], batch["pixel_mask"],
            batch["labels"], rng, batch.get("valid"))
        return _update(state, grads, total, losses, lr_scale)

    if accum_steps == 1:
        return train_step_single

    @jax.jit
    def _grads_mb(params, mb, rng):
        (total, losses), grads = grad_fn(
            params, mb["pixel_values"], mb["pixel_mask"], mb["labels"], rng,
            mb.get("valid"))
        return grads, total, losses

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _acc_add(acc, new):
        return jax.tree.map(jnp.add, acc, new)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _apply(state, acc, lr_scale=1.0):
        grads, total, losses = acc
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads)
        # metrics averaged over microbatches, not last-wins: the logged
        # losses describe the full global batch, matching what the
        # reference's Lightning loop logs for an accumulated step
        total = total * inv
        losses = jax.tree.map(lambda x: x * inv, losses)
        return _update(state, grads, total, losses, lr_scale)

    def train_step(state: TrainState, batch, rng, lr_scale=1.0):
        """Accumulated step: ``batch`` is either the concatenated
        [A*B, ...] dict (split here with the stride convention) or an
        already-split list of A microbatch dicts (the mesh path:
        trainer.fit splits on host and shards each microbatch over the
        full data axis). State is donated by the final apply program."""
        mbs = batch if isinstance(batch, (list, tuple)) \
            else split_microbatches(batch, accum_steps)
        rngs = jax.random.split(rng, accum_steps)
        acc = _grads_mb(state.params, mbs[0], rngs[0])
        for a in range(1, accum_steps):
            acc = _acc_add(acc, _grads_mb(state.params, mbs[a], rngs[a]))
        return _apply(state, acc, lr_scale)

    # expose the inner compiled programs so probes/tools can lower and
    # inspect them (the accumulated step itself is a plain Python loop)
    train_step.grads_mb = _grads_mb
    train_step.acc_add = _acc_add
    train_step.apply_grads = _apply
    return train_step


def split_microbatches(batch, accum_steps: int):
    """Split a global batch into ``accum_steps`` microbatches by row
    stride (microbatch ``a`` takes rows ``a::accum_steps``).

    The stride convention (not contiguous blocks) is what makes multi-host
    accumulation work: each host applies the same stride to its *local*
    contiguous slice, and as long as the per-host row count divides by
    ``accum_steps`` the per-host pieces of global microbatch ``a`` remain
    contiguous and in host order — exactly the layout
    ``jax.make_array_from_process_local_data`` expects (parallel/mesh.py).

    EVERY key of the batch is split (each value must be a [B, ...] array
    or a pytree of them, like ``labels``): silently dropping unknown keys
    would strip e.g. the ``valid`` mask from an accumulated masked step.
    Non-batched values are rejected rather than passed through ambiguously.
    """
    def sp(a, x):
        if getattr(x, "ndim", 0) == 0 or x.shape[0] % accum_steps:
            raise ValueError(
                f"batch leaf with shape {getattr(x, 'shape', None)} cannot "
                f"be split into {accum_steps} microbatches (leading axis "
                "must exist and divide by the accumulation depth)")
        return x[a::accum_steps]

    return [
        {k: jax.tree.map(lambda x: sp(a, x), val)
         for k, val in batch.items()}
        for a in range(accum_steps)
    ]


def make_eval_step(model, cfg: EgtrConfig, task: str = "sgg") -> Callable:
    """eval_step(params, batch) -> (outputs, losses) without sampling.

    ``batch["valid"]`` (when present) masks the padded tail rows the
    loader appends to keep eval shapes static — the validation loss that
    drives best-checkpoint selection and early stopping is computed over
    real images only."""

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch["pixel_values"], batch["pixel_mask"],
                          deterministic=True)
        valid = batch.get("valid")
        if task == "sgg":
            total, losses = sgg_criterion(out, batch["labels"], cfg,
                                          train=False, valid=valid)
        else:
            total, losses = detection_criterion(out, batch["labels"], cfg,
                                                valid=valid)
        losses["total_loss"] = total
        return out, losses

    return eval_step
