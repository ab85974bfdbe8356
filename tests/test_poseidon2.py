"""Poseidon2 permutation + ct_commitment sponge (structure tests).

The permutation structure and rate-3 sponge are exact per the reference
(``ct_helper/src/main.nr``); the constant tables await an external
conformance vector (see hash/poseidon2.py docstring).
"""

import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.hash import poseidon2


def test_tpu_permutation_matches_python_ref():
    states = [[0, 1, 2, 3], [7, 11, 13, 17]]
    dev = jnp.asarray(FR.to_mont(np.array(states, dtype=object)))
    out = poseidon2.permutation(dev)
    got = FR.from_mont(np.asarray(out))
    for i, s in enumerate(states):
        exp = poseidon2.permutation_ref(s)
        assert [int(v) for v in got[i]] == exp


def test_ct_commitment_sponge_matches_ref():
    # short packed list (covers the full-block loop AND the remainder path);
    # the full 157-field absorption runs in the audit integration script.
    import jax
    packed = [(1 << (32 * (i % 7))) + i for i in range(8)]
    exp = poseidon2.ct_commitment_ref(packed)
    dev = jnp.asarray(FR.to_mont(np.array([packed], dtype=object)))
    got = FR.from_mont(np.asarray(jax.jit(poseidon2.ct_commitment)(dev)))
    assert int(got[0]) == exp


def test_permutation_is_permutation():
    # distinct inputs map to distinct outputs (sanity)
    a = poseidon2.permutation_ref([0, 0, 0, 0])
    b = poseidon2.permutation_ref([0, 0, 0, 1])
    assert a != b
