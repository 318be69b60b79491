"""On-disk cache of COMPILED executables (AOT warm start).

The persistent XLA compilation cache does not round-trip Pallas/Mosaic
custom calls on the axon-tunneled TPU backend (utils/cache.py: a trivial
kernel recompiles in 112-169 s, full-model compiles 576-2271 s), so every
process pays the full compile. ``jax.experimental.serialize_executable``
serializes the *compiled PJRT executable* — the only mechanism that can
skip XLA compilation entirely (scripts/perf_probe_export.py measures
whether the backend honors it).

``load_or_compile`` is the productized wrapper: hash the lowered module,
try to deserialize a cached executable, else compile and persist. Opt in
with ``EGTR_AOT_CACHE=1`` (or an explicit ``cache_dir``); any failure in
the cache path falls back to a plain compile — correctness never depends
on the cache.

The cache key covers the lowered StableHLO text, the jax version, and the
device platform/kind, so code or shape changes miss cleanly. Executables
are machine-code artifacts: entries are NOT portable across backends or
library versions, which the key encodes.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import time
from typing import Any, Callable, Optional


def aot_cache_dir() -> Optional[str]:
    """Cache directory, or None when the AOT cache is disabled."""
    explicit = os.environ.get("EGTR_AOT_CACHE_DIR")
    if explicit:
        return explicit
    if os.environ.get("EGTR_AOT_CACHE", "0") == "1":
        return os.path.expanduser("~/.cache/egtr_aot")
    return None


def _key(lowered, tag: str) -> str:
    import jax

    dev = jax.devices()[0]
    ident = "\x00".join([
        tag,
        jax.__version__,
        getattr(dev, "platform", "?"),
        getattr(dev, "device_kind", "?"),
        lowered.as_text(),
    ])
    return hashlib.sha256(ident.encode()).hexdigest()[:16]


def maybe_aot(jfn, tag: str):
    """Wrap a jitted callable with the AOT executable cache, dispatching
    per argument-shape signature (a ``Compiled`` is shape-specialized;
    bucketed loaders feed a handful of distinct shapes). Returns ``jfn``
    unchanged when the cache is disabled, when ``jfn`` is not a jitted
    function (no ``.lower`` — e.g. the grad-accumulation train step is a
    plain Python loop over inner programs), or under multi-process
    execution (serialized executables pin a single-process device
    assignment) — so call sites can wrap unconditionally."""
    if aot_cache_dir() is None or not hasattr(jfn, "lower"):
        return jfn
    import jax

    if jax.process_count() > 1:
        return jfn

    compiled = {}

    def call(*args):
        # the key must cover SHARDINGS too, not just shapes: a Compiled
        # is placement-specialized and, unlike jit, does not re-lower —
        # under a single-process multi-device mesh, step 1's output
        # shardings (compiler-chosen, donated back in) or the precompile
        # warm thread's unsharded zeros would otherwise collide with
        # differently-placed arguments and fail at dispatch
        key = tuple(
            (getattr(a, "shape", None), str(getattr(a, "dtype", type(a))),
             str(getattr(a, "sharding", None)))
            for a in jax.tree_util.tree_leaves(args))
        c = compiled.get(key)
        if c is None:
            c = compiled[key] = load_or_compile(jfn, *args, tag=tag)
        return c(*args)

    return call


def load_or_compile(jfn, *args, tag: str,
                    cache_dir: Optional[str] = None,
                    log: Callable[[str], None] = print) -> Any:
    """Return a ``Compiled`` for ``jfn`` at ``args``' shapes.

    Tries the on-disk executable cache first (hit = no XLA compile at
    all); on miss, compiles and persists. ``tag`` names the program in
    the cache (and in log lines). With the cache disabled this is
    exactly ``jfn.lower(*args).compile()``.
    """
    cache_dir = cache_dir if cache_dir is not None else aot_cache_dir()
    lowered = jfn.lower(*args)
    if cache_dir is None:
        return lowered.compile()

    from jax.experimental import serialize_executable

    try:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"{tag}-{_key(lowered, tag)}.exec")
    except Exception as e:
        log(f"[aot] cache setup failed ({e}); compiling")
        return lowered.compile()

    if os.path.exists(path):
        t0 = time.time()
        try:
            import jax

            with open(path, "rb") as fh:
                device_ids, payload = pickle.load(fh)
            # restore the exact compile-time device assignment (order
            # matters for sharded programs; the default is ALL local
            # devices, which breaks single-device programs on multi-
            # device hosts)
            by_id = {d.id: d for d in jax.devices()}
            devices = [by_id[i] for i in device_ids]
            compiled = serialize_executable.deserialize_and_load(
                *payload, execution_devices=devices)
            log(f"[aot] {tag}: loaded cached executable in "
                f"{time.time() - t0:.1f}s ({path})")
            return compiled
        except Exception as e:
            # stale/incompatible entry: drop it and recompile
            log(f"[aot] {tag}: cached executable rejected "
                f"({type(e).__name__}: {e}); recompiling")
            try:
                os.unlink(path)
            except OSError:
                pass

    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        payload = serialize_executable.serialize(compiled)
        device_ids = [d.id for d in
                      compiled.runtime_executable().local_devices()]
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump((device_ids, payload), fh)
        os.replace(tmp, path)  # atomic: concurrent processes see all/none
        log(f"[aot] {tag}: compiled in {compile_s:.1f}s, cached "
            f"{os.path.getsize(path) / 1e6:.1f} MB -> {path}")
    except Exception as e:
        log(f"[aot] {tag}: compiled in {compile_s:.1f}s; serialization "
            f"unavailable ({type(e).__name__}: {e})")
    return compiled
