"""Optimizer construction: AdamW with the reference's three LR param groups.

Reference (train_egtr.py:426-467 / pretrain_detr.py:171-193):
- ``lr_backbone``: backbone convs + ``reference_points`` + the MSDA
  ``sampling_offsets`` linears,
- ``lr_initialized``: the freshly initialized relation head (only when
  fine-tuning from a pretrained detector),
- ``lr``: everything else.

Frozen (zero-update) sets, matching the reference:
- backbone stem + layer1 (deformable_detr.py:763-770),
- all FrozenBatchNorm buffers,
- the non-trainable frequency-bias buffers rel_dist / triplet_dist.

Implemented as ``optax.multi_transform`` over path-derived labels, plus
global-norm clipping (gradient_clip_val=0.1, train_egtr.py:539).
"""

from __future__ import annotations

from typing import Collection, Optional

import jax
import optax


def param_label(path: tuple,
                initialized_paths: Optional[Collection[str]] = None) -> str:
    """Label one param path with its LR group.

    ``initialized_paths``: the freshly-initialized param paths returned by
    ``checkpoint.merge_pretrained`` ("/"-joined; entries may be subtree
    prefixes). The reference builds its ``lr_initialized`` group from
    exactly this set — every missing-or-shape-mismatched key of
    ``from_pretrained`` (train_egtr.py:263-272,426-467) — so e.g. a
    ``class_embed`` re-initialized for a different label count trains at
    ``lr_initialized`` too, not just the relation head. ``None`` (legacy
    callers without a pretrained merge) falls back to the relation-head
    heuristic, which equals the reference set for the standard
    detector→EGTR finetune."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys)
    # frozen sets
    if "rel_dist" in joined or "triplet_dist" in joined:
        return "frozen"
    if "backbone" in joined:
        if ("conv1" in keys or "bn1" in keys
                or any(str(k).startswith("layer1_") for k in keys)):
            return "frozen"
        if "running_mean" in joined or "running_var" in joined:
            return "frozen"
        # frozen-BN affine params inside trainable layers still train in the
        # reference? No: FrozenBatchNorm buffers are torch buffers, never
        # trained — weight/bias included.
        if keys[-1] in ("weight", "bias") and any(
                "bn" in str(k) or "downsample_bn" in str(k) for k in keys):
            return "frozen"
        return "backbone"
    if "reference_points" in joined or "sampling_offsets" in joined:
        return "backbone"
    if initialized_paths is None:
        if "relation_head" in joined:
            return "initialized"
    elif any(joined == p or joined.startswith(p + "/")
             for p in initialized_paths):
        return "initialized"
    return "main"


def make_optimizer(lr: float, lr_backbone: float,
                   lr_initialized: Optional[float] = None,
                   weight_decay: float = 1e-4,
                   grad_clip: float = 0.1,
                   initialized_paths: Optional[Collection[str]] = None
                   ) -> optax.GradientTransformation:
    def adamw(learning_rate):
        return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)

    transforms = {
        "main": adamw(lr),
        "backbone": adamw(lr_backbone),
        "initialized": adamw(lr_initialized if lr_initialized is not None
                             else lr),
        "frozen": optax.set_to_zero(),
    }

    # freeze the path set now: optax calls `labels` lazily at init time
    paths = tuple(initialized_paths) if initialized_paths is not None \
        else None

    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: param_label(path, paths), params)

    tx = optax.multi_transform(transforms, labels)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
