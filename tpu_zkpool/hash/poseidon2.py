"""Poseidon2 (t=4) permutation + the ct_commitment sponge.

Implements the permutation structure and sponge used for the audit
circuit's ciphertext commitment (reference ``ct_helper/src/main.nr:15-34``,
``scripts/generate_audit.py:355-374``): Poseidon2 with t=4, R_F=8, R_P=56,
x^5 S-box, external matrix M4 = circ-like [[5,7,1,3],[4,6,1,1],[1,3,5,7],
[1,1,4,6]], internal matrix = all-ones + diag, and a rate-3/capacity-1
absorption sponge over the 157 packed ciphertext fields.

CONFORMANCE NOTE: the reference's `std::hash::poseidon2_permutation` uses
Barretenberg's round constants, which are not derivable from any committed
artifact in the reference repo (the audit circuit's compiled artifacts are
stripped — SURVEY.md §7.3 item 7). The constants here are generated with the
same Grain-LFSR procedure validated for Poseidon(1); the permutation
structure and sponge are exact, and the constant tables are isolated in
``poseidon2_constants()`` so a conformance vector can pin or replace them.
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


@functools.lru_cache(maxsize=None)
def poseidon2_constants(p: int = FR_MOD):
    """(external_rc [R_F][T], internal_rc [R_P], internal_diag [T])."""
    g = _GrainLFSR(1, 0, 254, T, R_F, R_P)
    ext = [[g.field_element(254, p) for _ in range(T)] for _ in range(R_F)]
    internal = [g.field_element(254, p) for _ in range(R_P)]
    diag = [g.field_element(254, p) for _ in range(T)]
    return ext, internal, diag


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
        s = [(tot + (diag[i] - 1) * s[i]) % p for i in range(T)]
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
    diag_m = FR.to_mont(np.array([d - 1 for d in diag], dtype=object))
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
