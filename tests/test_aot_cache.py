"""AOT executable cache (utils/aot.py): correctness of the miss ->
persist -> hit cycle on the CPU backend. Whether the axon TPU backend
honors executable round-trips is measured separately on hardware
(scripts/perf_probe_export.py); this pins the wrapper's behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from egtr_tpu.utils.aot import load_or_compile


def _fn():
    return jax.jit(lambda x: jnp.sin(x) * 2.0 + 1.0)


def test_aot_cache_roundtrip(tmp_path):
    logs = []
    x = jnp.linspace(0.0, 1.0, 8)

    c1 = load_or_compile(_fn(), x, tag="t", cache_dir=str(tmp_path),
                         log=logs.append)
    files = list(tmp_path.glob("t-*.exec"))
    assert len(files) == 1, (files, logs)
    assert any("cached" in m for m in logs)

    c2 = load_or_compile(_fn(), x, tag="t", cache_dir=str(tmp_path),
                         log=logs.append)
    assert any("loaded cached executable" in m for m in logs), logs
    np.testing.assert_allclose(np.asarray(c2(x)), np.asarray(c1(x)))
    np.testing.assert_allclose(np.asarray(c1(x)),
                               np.sin(np.asarray(x)) * 2.0 + 1.0,
                               rtol=1e-6)


def test_aot_cache_key_misses_on_shape_and_code(tmp_path):
    logs = []
    load_or_compile(_fn(), jnp.zeros(8), tag="t", cache_dir=str(tmp_path),
                    log=logs.append)
    load_or_compile(_fn(), jnp.zeros(16), tag="t", cache_dir=str(tmp_path),
                    log=logs.append)
    other = jax.jit(lambda x: jnp.cos(x))
    load_or_compile(other, jnp.zeros(8), tag="t", cache_dir=str(tmp_path),
                    log=logs.append)
    assert len(list(tmp_path.glob("t-*.exec"))) == 3
    assert not any("loaded cached" in m for m in logs)


def test_aot_cache_corrupt_entry_recompiles(tmp_path):
    logs = []
    x = jnp.zeros(8)
    load_or_compile(_fn(), x, tag="t", cache_dir=str(tmp_path),
                    log=logs.append)
    (path,) = tmp_path.glob("t-*.exec")
    path.write_bytes(b"not a pickle")
    c = load_or_compile(_fn(), x, tag="t", cache_dir=str(tmp_path),
                        log=logs.append)
    assert any("rejected" in m for m in logs), logs
    np.testing.assert_allclose(np.asarray(c(x)), 1.0)


def test_aot_cache_disabled_is_plain_compile(tmp_path, monkeypatch):
    monkeypatch.delenv("EGTR_AOT_CACHE", raising=False)
    monkeypatch.delenv("EGTR_AOT_CACHE_DIR", raising=False)
    c = load_or_compile(_fn(), jnp.zeros(4), tag="t")
    assert np.isfinite(np.asarray(c(jnp.zeros(4)))).all()
    assert list(tmp_path.iterdir()) == []


def test_aot_cache_sharded_program_roundtrip(tmp_path):
    """A program compiled over an explicit 8-device mesh must restore
    onto the same device assignment (deserialize defaults to all local
    devices in enumeration order; the cache records the compile-time
    order)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, PartitionSpec("data"))
    x = jax.device_put(jnp.arange(32.0), sh)
    f = jax.jit(lambda v: v * 2.0, in_shardings=sh, out_shardings=sh)

    logs = []
    c1 = load_or_compile(f, x, tag="sh", cache_dir=str(tmp_path),
                         log=logs.append)
    c2 = load_or_compile(f, x, tag="sh", cache_dir=str(tmp_path),
                         log=logs.append)
    assert any("loaded cached executable" in m for m in logs), logs
    np.testing.assert_allclose(np.asarray(c2(x)), np.asarray(c1(x)))
    np.testing.assert_allclose(np.asarray(c2(x)), np.arange(32.0) * 2.0)


def test_maybe_aot_sharding_in_dispatch_key(tmp_path, monkeypatch):
    """Same shape, different placement must NOT collide: a Compiled is
    placement-specialized and does not re-lower like jit — under a
    single-process mesh, donated-back outputs (compiler-chosen
    shardings) or the precompile warm thread's unsharded zeros would
    hit the shape-only key and fail at dispatch."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from egtr_tpu.utils import aot

    monkeypatch.setenv("EGTR_AOT_CACHE_DIR", str(tmp_path))
    g = aot.maybe_aot(jax.jit(lambda v: v * 2.0), "shkey")

    x = jnp.arange(32.0)
    np.testing.assert_allclose(np.asarray(g(x)), np.arange(32.0) * 2.0)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
    np.testing.assert_allclose(np.asarray(g(xs)), np.arange(32.0) * 2.0)
    assert len(list(tmp_path.glob("shkey-*.exec"))) == 2


def test_maybe_aot_trainer_wiring(tmp_path, monkeypatch):
    """The trainer wraps its steps unconditionally: maybe_aot must be the
    identity for non-jitted callables (the accum>1 train step is a plain
    Python loop) and must round-trip a DONATED jitted program (the
    train step donates its state) with identical numerics, including a
    traced trailing float arg (lr_scale)."""
    import functools

    from egtr_tpu.utils import aot

    monkeypatch.setenv("EGTR_AOT_CACHE_DIR", str(tmp_path))

    def plain(x):
        return x

    assert aot.maybe_aot(plain, "p") is plain

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(s, g, lr_scale=1.0):
        return jax.tree.map(lambda a, b: a - lr_scale * b, s, g)

    grads = {"w": jnp.ones(4)}
    want = np.arange(4.0) - 0.5
    out = aot.maybe_aot(step, "ts")({"w": jnp.arange(4.0)}, grads, 0.5)
    np.testing.assert_allclose(np.asarray(out["w"]), want)
    assert len(list(tmp_path.glob("ts-*.exec"))) == 1
    # a fresh wrapper loads the serialized executable; lr_scale stays a
    # runtime arg (different value, same executable)
    out2 = aot.maybe_aot(step, "ts")({"w": jnp.arange(4.0)}, grads, 0.25)
    np.testing.assert_allclose(np.asarray(out2["w"]), np.arange(4.0) - 0.25)
    assert len(list(tmp_path.glob("ts-*.exec"))) == 1


def test_maybe_aot_shape_dispatch(tmp_path, monkeypatch):
    """maybe_aot wraps a jitted fn with per-shape Compiled dispatch when
    the cache is enabled, and is the identity when disabled."""
    from egtr_tpu.utils import aot

    f = _fn()
    monkeypatch.delenv("EGTR_AOT_CACHE", raising=False)
    monkeypatch.delenv("EGTR_AOT_CACHE_DIR", raising=False)
    assert aot.maybe_aot(f, "m") is f

    monkeypatch.setenv("EGTR_AOT_CACHE_DIR", str(tmp_path))
    g = aot.maybe_aot(f, "m")
    np.testing.assert_allclose(np.asarray(g(jnp.zeros(4))), 1.0)
    np.testing.assert_allclose(np.asarray(g(jnp.zeros(8))), 1.0)
    np.testing.assert_allclose(
        np.asarray(g(jnp.full(4, 0.5))),
        np.sin(0.5) * 2.0 + 1.0, rtol=1e-6)
    assert len(list(tmp_path.glob("m-*.exec"))) == 2  # one per shape
