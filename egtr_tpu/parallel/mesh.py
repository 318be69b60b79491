"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL (train_egtr.py:776,
util/misc.py:439-466). The TPU-native equivalent is one jit-compiled train
step over a ``jax.sharding.Mesh``:

- ``data`` axis: batch sharding (the DDP analog; gradient all-reduce becomes
  an XLA psum over ICI),
- ``model`` axis: shards the O(Q^2) relation grid of the EGTR head — the
  framework's sequence-parallel analog (SURVEY.md §5) — and is available for
  tensor-parallel layouts of the heads.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // mp
    assert dp * mp == n, f"dp({dp}) * mp({mp}) != #devices({n})"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch dict with the batch axis over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def maybe_constraint(x, spec: P):
    """Apply a sharding constraint iff a mesh with the named axes is active
    (no-op on single device / unmeshed tracing)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        return x
    if mesh is None or not mesh.shape_tuple:
        return x
    names = set(mesh.axis_names)
    used = {ax for e in spec for ax in
            ((e,) if isinstance(e, str) else (e or ()))}
    if not used.issubset(names):
        return x
    return jax.lax.with_sharding_constraint(x, spec)
