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


def _mesh_device_order(devices, mp: int):
    """Order devices so the mesh maps onto the interconnect hierarchy.

    Multi-slice TPU pods expose ``device.slice_index``; inter-slice links
    (DCN) are far slower than ICI. With ``data`` as the OUTER mesh axis,
    making the device order slice-major keeps every ``model``-axis group
    (tensor/grid-parallel collectives: all_gather/psum per layer) inside
    one slice, and the only DCN traffic is the once-per-step gradient
    psum over ``data`` — which XLA decomposes hierarchically
    (intra-slice reduce-scatter, inter-slice all-reduce) when the order
    reflects the hierarchy. Single-slice (or CPU) device lists are
    returned unchanged.
    """
    if any(getattr(d, "slice_index", None) not in (None, 0)
           for d in devices):
        devices = sorted(devices,
                         key=lambda d: (getattr(d, "slice_index", 0) or 0,
                                        d.id))
        per_slice = {}
        for d in devices:
            per_slice.setdefault(getattr(d, "slice_index", 0) or 0,
                                 []).append(d)
        sizes = {len(v) for v in per_slice.values()}
        # ValueError, not assert: these depend on user topology input and
        # must survive python -O — a silently mis-ordered mesh puts model
        # groups across DCN, the exact layout this function prevents
        if len(sizes) != 1:
            raise ValueError(f"uneven slices: {dict((k, len(v)) for k, v in per_slice.items())}")
        if sizes.pop() % mp != 0:
            raise ValueError(
                f"model axis ({mp}) must divide the per-slice device count "
                f"so model groups never cross DCN")
    return devices


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    devices = _mesh_device_order(devices, mp)
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp({dp}) * mp({mp}) != #devices({n})")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch dict with the batch axis over ``data``.

    Multi-process: each host's loader holds only its contiguous
    ``batch/process_count`` slice (the DistributedSampler contract,
    reference train_egtr.py:624-640). The slices are ASSEMBLED into one
    global array via ``jax.make_array_from_process_local_data`` — a plain
    ``device_put`` here would reinterpret the host-local slice as the
    whole global array, silently shrinking the effective batch to
    ``global/process_count`` and dropping the rest of the loaded data.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(tree, mesh: Mesh):
    """Turn host-local (identical-per-process) arrays into fully-replicated
    GLOBAL arrays over ``mesh``. Required before feeding params/opt_state
    to a jit program spanning multiple processes; a no-op single-process
    (jit replicates automatically there)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, tree), mesh, P())


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
