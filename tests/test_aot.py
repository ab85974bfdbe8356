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
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].startswith("t_poly-")

    # second resolution must come from DISK (fresh resolver memo), not
    # a re-export: poison the fn so an export attempt would fail.
    monkeypatch.setattr(aot, "_RESOLVED", {})
    f2 = aot.cached_call("t_poly", None, sds)
    assert (np.asarray(f2(x, y)) == out).all()
    assert len(os.listdir(tmp_path)) == 1


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
    assert len(os.listdir(tmp_path)) == 3


def test_msm_dispatch_kill_switch(monkeypatch):
    """TPUZK_NO_AOT=1 must route the pallas dispatch to the plain jit —
    exercised through grid._msm_rows_dispatch's gate (the pallas branch
    itself needs a TPU; the gate check is platform-free)."""
    monkeypatch.setenv("TPUZK_NO_AOT", "1")
    assert not aot.enabled()
    monkeypatch.delenv("TPUZK_NO_AOT")
    assert aot.enabled()


def test_source_fingerprint_stable():
    a = aot.source_fingerprint()
    aot.source_fingerprint.cache_clear()
    assert aot.source_fingerprint() == a and len(a) == 16
