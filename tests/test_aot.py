"""utils/aot.py — disk-cached jax.export modules (round-4 driver fix).

The real win is on TPU (skipping minute-scale traces of the Pallas limb
modules); these CPU tests pin the mechanics: round-trip correctness,
on-disk reuse across resolver state, key sensitivity to shapes/statics,
and the TPUZK_NO_AOT kill switch honored by the MSM dispatch seam.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.utils import aot


def _fn():
    @jax.jit
    def poly(x, y):
        return x * x + 3 * y

    return poly


def test_cached_call_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "_AOT_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_RESOLVED", {})
    x = jnp.arange(8, dtype=jnp.float32)
    y = jnp.ones(8, dtype=jnp.float32)
    sds = (jax.ShapeDtypeStruct(x.shape, x.dtype),
           jax.ShapeDtypeStruct(y.shape, y.dtype))
    f = aot.cached_call("t_poly", _fn(), sds)
    out = np.asarray(f(x, y))
    assert (out == np.asarray(x) ** 2 + 3).all()
    gen = os.path.join(tmp_path, aot.source_fingerprint())
    files = os.listdir(gen)
    assert len(files) == 1 and files[0].startswith("t_poly-")

    # second resolution must come from DISK (fresh resolver memo), not
    # a re-export: poison the fn so an export attempt would fail.
    monkeypatch.setattr(aot, "_RESOLVED", {})
    f2 = aot.cached_call("t_poly", None, sds)
    assert (np.asarray(f2(x, y)) == out).all()
    assert len(os.listdir(gen)) == 1


def test_stale_generations_pruned(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "_AOT_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_RESOLVED", {})
    os.makedirs(tmp_path / "deadbeef00112233")
    (tmp_path / "deadbeef00112233" / "x.jaxexport").write_bytes(b"old")
    (tmp_path / "loose.jaxexport").write_bytes(b"flat-layout leftover")
    sds = (jax.ShapeDtypeStruct((4,), jnp.float32),
           jax.ShapeDtypeStruct((4,), jnp.float32))
    aot.cached_call("t_poly", _fn(), sds)
    left = sorted(os.listdir(tmp_path))
    assert left == [aot.source_fingerprint()]


def test_key_varies_with_shape_and_statics(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "_AOT_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_RESOLVED", {})
    a8 = (jax.ShapeDtypeStruct((8,), jnp.float32),
          jax.ShapeDtypeStruct((8,), jnp.float32))
    a4 = (jax.ShapeDtypeStruct((4,), jnp.float32),
          jax.ShapeDtypeStruct((4,), jnp.float32))
    aot.cached_call("t_poly", _fn(), a8)
    aot.cached_call("t_poly", _fn(), a4)
    aot.cached_call("t_poly", _fn(), a8, static_args=(13,))
    gen = os.path.join(tmp_path, aot.source_fingerprint())
    assert len(os.listdir(gen)) == 3


def test_msm_dispatch_kill_switch(monkeypatch):
    """TPUZK_NO_AOT=1 must route grid._msm_rows_dispatch to the plain
    jit with statics in the right order; with AOT on, the pallas branch
    must consult aot.cached_call (sentinel-stubbed — the real pallas
    compile needs a TPU)."""
    from tpu_zkpool.msm import grid

    calls = []
    monkeypatch.setattr(grid, "_msm_rows",
                        lambda *a: calls.append(("jit", a)) or "jit-out")
    monkeypatch.setattr(
        aot, "cached_call",
        lambda name, fn, args, static_args=(): (
            lambda rows, limbs: calls.append(("aot", name)) or "aot-out"))

    rows = jnp.zeros((1024, 3, 1, 16), jnp.uint32)
    limbs = jnp.zeros((1024, 16), jnp.uint32)
    statics = (13, "pallas", False, 1024, True, True, 255, False)

    monkeypatch.setenv("TPUZK_NO_AOT", "1")
    assert not aot.enabled()
    out = grid._msm_rows_dispatch(rows, limbs, *statics)
    assert out == "jit-out" and calls[-1][0] == "jit"
    assert calls[-1][1][2:] == statics    # statics order preserved

    monkeypatch.delenv("TPUZK_NO_AOT")
    assert aot.enabled()
    out = grid._msm_rows_dispatch(rows, limbs, *statics)
    assert out == "aot-out" and calls[-1] == ("aot", "msm_rows_n1024x1")

    # the XLA backend must never touch the AOT path
    out = grid._msm_rows_dispatch(rows, limbs, 13, "xla", False, 1024,
                                  True, False, 255, False)
    assert out == "jit-out" and calls[-1][0] == "jit"


def test_source_fingerprint_stable():
    a = aot.source_fingerprint()
    aot.source_fingerprint.cache_clear()
    assert aot.source_fingerprint() == a and len(a) == 16
