"""Poseidon2 (t=4) permutation + the ct_commitment sponge.

Implements the permutation structure and sponge used for the audit
circuit's ciphertext commitment (reference ``ct_helper/src/main.nr:15-34``,
``scripts/generate_audit.py:355-374``): Poseidon2 with t=4, R_F=8, R_P=56,
x^5 S-box, external matrix M4 = circ-like [[5,7,1,3],[4,6,1,1],[1,3,5,7],
[1,1,4,6]], internal matrix = all-ones + diag, and a rate-3/capacity-1
absorption sponge over the 157 packed ciphertext fields.

CONFORMANCE: the reference's `std::hash::poseidon2_permutation` uses
Barretenberg's parameters (the ACVM blackbox the audit circuit's sunspot
backend must agree with — ``ct_helper/src/main.nr:23``). These are now
reproduced bit-exactly: the round constants are the Grain-LFSR stream
(1, 0, 254, t=4, R_F=8, R_P=56) with rejection sampling, drawn in round
order — 4 pre-full rounds x 4, 56 internal singles, 4 post-full rounds x 4
— and the internal matrix is all-ones + diag(mu) with the mu-1 diagonal
pinned below (bb's ``internal_matrix_diagonal``). Validated against bb's
permutation test vector: permutation(0,1,2,3) — see
``tests/test_poseidon2.py::test_bb_conformance_vector``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.bn254 import FR_MOD
from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.fields.limbs import NLIMB
from tpu_zkpool.hash.poseidon_params import _GrainLFSR

T = 4
R_F = 8
R_P = 56

M4 = [[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]]

# Barretenberg's internal matrix diagonal (mu - 1 values): M_I row i =
# sum_j s_j + DIAG_M1[i] * s_i. Conformance-pinned by the permutation
# test vector (tests/test_poseidon2.py).
DIAG_M1 = [
    0x10dc6e9c006ea38b04b1e03b4bd9490c0d03f98929ca1d7fb56821fd19d3b6e7,
    0x0c28145b6a44df3e0149b3d0a30b3bb599df9756d4dd9b84a86b38cfb45a740b,
    0x00544b8338791518b2c7645a50392798b21f75bb60e3596170067d00141cac15,
    0x222c01175718386f2e2e82eb122789e352e105a3b8fa852613bc534433ee428b,
]


@functools.lru_cache(maxsize=None)
def poseidon2_constants(p: int = FR_MOD):
    """(external_rc [R_F][T], internal_rc [R_P], internal_diag_m1 [T]).

    Round constants come from the Grain LFSR in ROUND order (bb layout):
    the 4 pre-full rounds' 4 constants each, then one constant per internal
    round, then the 4 post-full rounds.
    """
    g = _GrainLFSR(1, 0, 254, T, R_F, R_P)
    half = R_F // 2
    ext_pre = [[g.field_element(254, p) for _ in range(T)] for _ in range(half)]
    internal = [g.field_element(254, p) for _ in range(R_P)]
    ext_post = [[g.field_element(254, p) for _ in range(T)] for _ in range(half)]
    return ext_pre + ext_post, internal, list(DIAG_M1)


# ------------------------------------------------------------ reference path

def permutation_ref(state, p: int = FR_MOD):
    """Pure-Python Poseidon2 permutation on a length-4 list of ints."""
    ext_rc, int_rc, diag = poseidon2_constants(p)

    def m4(s):
        return [sum(M4[i][j] * s[j] for j in range(T)) % p for i in range(T)]

    s = m4([x % p for x in state])
    half = R_F // 2
    for r in range(half):
        s = [(x + c) % p for x, c in zip(s, ext_rc[r])]
        s = [pow(x, 5, p) for x in s]
        s = m4(s)
    for r in range(R_P):
        s[0] = (s[0] + int_rc[r]) % p
        s[0] = pow(s[0], 5, p)
        tot = sum(s) % p
        s = [(tot + diag[i] * s[i]) % p for i in range(T)]
    for r in range(half, R_F):
        s = [(x + c) % p for x, c in zip(s, ext_rc[r])]
        s = [pow(x, 5, p) for x in s]
        s = m4(s)
    return s


def ct_commitment_ref(packed_fields, p: int = FR_MOD) -> int:
    """Rate-3 sponge over packed ciphertext fields (ct_helper/src/main.nr)."""
    state = [0, 0, 0, 0]
    n = len(packed_fields)
    full = n // 3
    for i in range(full):
        state[0] = (state[0] + packed_fields[3 * i]) % p
        state[1] = (state[1] + packed_fields[3 * i + 1]) % p
        state[2] = (state[2] + packed_fields[3 * i + 2]) % p
        state = permutation_ref(state, p)
    rem = n - full * 3
    if rem >= 1:
        state[0] = (state[0] + packed_fields[full * 3]) % p
    if rem >= 2:
        state[1] = (state[1] + packed_fields[full * 3 + 1]) % p
    state = permutation_ref(state, p)
    return state[0]


# ------------------------------------------------------------- TPU path

@functools.lru_cache(maxsize=None)
def _mont_tables():
    ext, internal, diag = poseidon2_constants()
    ext_m = FR.to_mont(np.array(ext, dtype=object))            # (R_F, 4, 16)
    int_m = FR.to_mont(np.array(internal, dtype=object))       # (R_P, 16)
    diag_m = FR.to_mont(np.array(diag, dtype=object))          # mu - 1 values
    return ext_m, int_m, diag_m


def _m4_mix(s):
    """External M4 mix on uint32[..., 4, 16] via shift-free small-constant
    multiplication (adds only; entries in {1,3,4,5,6,7})."""
    def smul(x, k):
        # k in 1..7 by repeated doubling/addition
        acc = None
        base = x
        kk = k
        while kk:
            if kk & 1:
                acc = base if acc is None else FR.add(acc, base)
            base = FR.add(base, base)
            kk >>= 1
        return acc

    outs = []
    for i in range(T):
        acc = None
        for j in range(T):
            term = smul(s[..., j, :], M4[i][j])
            acc = term if acc is None else FR.add(acc, term)
        outs.append(acc)
    return jnp.stack(outs, axis=-2)


def _x5(x):
    x2 = FR.mont_mul(x, x)
    return FR.mont_mul(FR.mont_mul(x2, x2), x)


def permutation(state: jnp.ndarray) -> jnp.ndarray:
    """Poseidon2 permutation on uint32[..., 4, 16] Montgomery states."""
    ext_m, int_m, diag_m = (jnp.asarray(x) for x in _mont_tables())
    s = _m4_mix(state)
    half = R_F // 2

    def ext_round(s, c):
        s = FR.add(s, c)
        s = _x5(s)
        return _m4_mix(s), None

    def int_round(s, c):
        s0 = _x5(FR.add(s[..., 0, :], c))
        s = jnp.concatenate([s0[..., None, :], s[..., 1:, :]], axis=-2)
        tot = s[..., 0, :]
        for j in range(1, T):
            tot = FR.add(tot, s[..., j, :])
        mixed = FR.add(tot[..., None, :], FR.mont_mul(diag_m, s))
        return mixed, None

    s, _ = jax.lax.scan(ext_round, s, ext_m[:half])
    s, _ = jax.lax.scan(int_round, s, int_m)
    s, _ = jax.lax.scan(ext_round, s, ext_m[half:])
    return s


def ct_commitment(packed: jnp.ndarray) -> jnp.ndarray:
    """Batched rate-3 sponge: uint32[..., n_packed, 16] Montgomery -> [..., 16]."""
    n = packed.shape[-2]
    full = n // 3
    state = jnp.zeros(packed.shape[:-2] + (4, NLIMB), dtype=jnp.uint32)

    for i in range(full):
        blk = packed[..., 3 * i : 3 * i + 3, :]
        absorbed = FR.add(state[..., :3, :], blk)
        state = jnp.concatenate([absorbed, state[..., 3:, :]], axis=-2)
        state = permutation(state)
    rem = n - 3 * full
    if rem:
        blk = packed[..., 3 * full :, :]
        absorbed = FR.add(state[..., :rem, :], blk)
        state = jnp.concatenate([absorbed, state[..., rem : 3, :],
                                 state[..., 3:, :]], axis=-2)
    state = permutation(state)
    return state[..., 0, :]
