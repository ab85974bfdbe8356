"""Pallas Poseidon kernel vs. reference (runs on TPU only; the CPU suite
forces the cpu backend where Mosaic kernels can't lower — bench.py exercises
this path on hardware every round)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Mosaic kernel requires TPU"
)


def test_hash2_pallas_matches_ref():
    from tpu_zkpool.fields.fctx import FR
    from tpu_zkpool.hash import poseidon_pallas as pp
    from tpu_zkpool.hash.poseidon_params import poseidon_hash_ref

    B = 1024
    va = [3, 1] + list(range(B - 2))
    vb = [5, 2] + list(range(100, B + 98))
    a = jnp.asarray(FR.to_mont(va))
    b = jnp.asarray(FR.to_mont(vb))
    got = FR.from_mont(np.asarray(pp.hash2_pallas(a, b)))
    for i in (0, 1, 17, B - 1):
        assert int(got[i]) == poseidon_hash_ref([va[i], vb[i]])
