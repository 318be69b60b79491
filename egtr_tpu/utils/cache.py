"""Persistent XLA compilation cache.

Every CLI entry point calls :func:`enable_compilation_cache` before
building models; tests share a per-host cache on the CPU backend.

Measured reach on the axon-tunneled TPU: plain XLA programs cache well
(95 s cold -> 27 s warm restart), but programs containing Pallas/Mosaic
custom calls do NOT currently round-trip through the persistent cache
(a trivial MSDA kernel recompiles in 112-169 s every process) — the
full-model compile cost on this tunnel is dominated by those kernels,
so treat per-process compiles of the model as unavoidable there.
"""

from __future__ import annotations

import os


def _host_tag() -> str:
    """Hash of the host CPU feature flags. XLA:CPU caches AOT machine
    code; loading an entry compiled on a host with different features
    can SIGILL (observed warning when a container migrated), so each
    host flavor gets its own cache directory."""
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except Exception:
        pass
    return "any"


def enable_compilation_cache(path: str | None = None) -> None:
    """Idempotently enable JAX's on-disk compilation cache."""
    import jax

    if path is None:
        # the SIGILL hazard is XLA:CPU-only; accelerator executables stay
        # valid across container migrations, so share one cache for them.
        # Backend is decided from JAX_PLATFORMS when set: calling
        # jax.default_backend() here would INITIALIZE the backend, and on
        # the axon tunnel that blocks indefinitely while the TPU is
        # unreachable — entry points must be able to set up the cache
        # (and e.g. re-exec onto CPU) without touching the chip.
        platforms = os.environ.get("JAX_PLATFORMS", "")
        if platforms:
            backend = platforms.split(",")[0].strip()
        else:
            backend = jax.default_backend()
        tag = _host_tag() if backend == "cpu" else "accel"
        path = os.environ.get(
            "EGTR_JAX_CACHE", os.path.expanduser(f"~/.cache/egtr_jax-{tag}"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        # never let caching break an entry point (read-only FS, etc.)
        pass
