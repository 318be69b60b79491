"""Cross-host object gather for evaluation-metric merging.

TPU-native analog of the reference's pickle-based ``all_gather``
(util/misc.py:93-135): each host contributes an arbitrary picklable object;
every host receives the list of all hosts' objects. Implemented with
``jax.experimental.multihost_utils.process_allgather`` over a padded uint8
buffer, which rides the ICI/DCN collectives XLA already manages — no
torch.distributed / NCCL analog needed.

Single-process (the common case in this container) short-circuits to
``[obj]`` so callers never branch.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per host; returns [obj_host0, ...]."""
    import jax

    n = jax.process_count()
    if n == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # first agree on the max payload size, then gather padded buffers
    sizes = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64))          # [n, 1]
    max_size = int(np.max(sizes))
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)   # [n, max_size]
    out = []
    for i in range(n):
        size = int(sizes[i][0] if np.ndim(sizes) > 1 else sizes[i])
        out.append(pickle.loads(gathered[i, :size].tobytes()))
    return out
