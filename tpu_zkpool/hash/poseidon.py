"""Batched Poseidon permutation / hashes for TPU (JAX path).

TPU-first design: states are ``uint32[..., t, 16]`` limb arrays in the
Montgomery domain, and every op broadcasts over leading batch axes so one
call evaluates thousands of independent hashes across the VPU — replacing
the reference's one-at-a-time circomlibjs / noir-lang Poseidon calls
(``client/merkle.ts:22-38``, ``noir_circuit/src/main.nr:7-9``).

Partial rounds run under ``lax.scan`` (57-60 iterations) to keep the traced
graph small; full rounds (8) are unrolled. Constants come from
``poseidon_params`` (Grain-LFSR, validated vs the reference's committed
vectors) and are pre-converted to Montgomery limbs at module import.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.fields.limbs import NLIMB
from tpu_zkpool.hash.poseidon_params import N_ROUNDS_F, N_ROUNDS_P, poseidon_constants


@functools.lru_cache(maxsize=None)
def _mont_tables(t: int):
    """(C_full_pre, C_partial, C_full_post, M) as Montgomery limb arrays.

    C arrays are grouped so full rounds index [round][i] and partial rounds
    scan over a stacked [r_p, t] array.
    """
    C, M = poseidon_constants(t)
    r_f, r_p = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    C_rounds = np.array(
        [[C[r * t + i] for i in range(t)] for r in range(r_f + r_p)], dtype=object
    )
    half = r_f // 2
    c_pre = FR.to_mont(C_rounds[:half])                    # (half, t, 16)
    c_mid = FR.to_mont(C_rounds[half : half + r_p])        # (r_p, t, 16)
    c_post = FR.to_mont(C_rounds[half + r_p :])            # (half, t, 16)
    m = FR.to_mont(np.array(M, dtype=object))              # (t, t, 16)
    # Cache host numpy only — caching jnp arrays would leak tracers across
    # jit traces. jnp.asarray at use sites is free (constant folding).
    return c_pre, c_mid, c_post, m


def _x5(x):
    x2 = FR.mont_mul(x, x)
    x4 = FR.mont_mul(x2, x2)
    return FR.mont_mul(x4, x)


def _mix(state, m):
    """MDS: out[..., i, :] = sum_j M[i][j] * state[..., j, :].

    state: (..., t, 16); m: (t, t, 16). All t^2 products run as ONE batched
    Montgomery multiply (broadcast over the (t, t) grid) — fewer, wider ops
    map better onto the VPU and keep the traced graph small.
    """
    t = m.shape[0]
    prod = FR.mont_mul(m, state[..., None, :, :])  # (..., t, t, 16)
    acc = prod[..., 0, :]
    for j in range(1, t):
        acc = FR.add(acc, prod[..., j, :])
    return acc


def permutation(state: jnp.ndarray, t: int) -> jnp.ndarray:
    """Poseidon permutation on Montgomery-domain states uint32[..., t, 16].

    All three round groups run as ``lax.scan`` over stacked per-round
    constants so the traced graph stays small (one full-round body + one
    partial-round body) regardless of round counts.
    """
    c_pre, c_mid, c_post, m = (jnp.asarray(x) for x in _mont_tables(t))

    def full_round(s, c):
        s = FR.add(s, c)
        s = _x5(s)
        return _mix(s, m), None

    def partial_round(s, c):
        s = FR.add(s, c)
        s0 = _x5(s[..., 0, :])
        s = jnp.concatenate([s0[..., None, :], s[..., 1:, :]], axis=-2)
        return _mix(s, m), None

    state, _ = jax.lax.scan(full_round, state, c_pre)
    state, _ = jax.lax.scan(partial_round, state, c_mid)
    state, _ = jax.lax.scan(full_round, state, c_post)
    return state


def hash_n(inputs: jnp.ndarray) -> jnp.ndarray:
    """Poseidon hash of uint32[..., n, 16] Montgomery inputs -> [..., 16].

    circomlib convention: state = [0, *inputs]; output = state[0] after one
    permutation (reference ``client/merkle.ts:22-38``).
    """
    n = inputs.shape[-2]
    t = n + 1
    zero = jnp.zeros(inputs.shape[:-2] + (1, NLIMB), dtype=jnp.uint32)
    state = jnp.concatenate([zero, inputs], axis=-2)
    return permutation(state, t)[..., 0, :]


def hash2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 2-ary Poseidon hash, uint32[..., 16] Montgomery in/out."""
    return hash_n(jnp.stack(jnp.broadcast_arrays(a, b), axis=-2))


def hash3(a, b, c):
    return hash_n(jnp.stack(jnp.broadcast_arrays(a, b, c), axis=-2))


def hash4(a, b, c, d):
    return hash_n(jnp.stack(jnp.broadcast_arrays(a, b, c, d), axis=-2))


# ------------------------------------------------------------- host helpers

def hash_ints(*columns) -> np.ndarray:
    """Hash columns of Python ints (host convenience; batches over leading dim)."""
    cols = [np.asarray(c, dtype=object) for c in columns]
    limbs = jnp.stack([jnp.asarray(FR.to_mont(c)) for c in cols], axis=-2)
    out = hash_n(limbs)
    return FR.from_mont(np.asarray(out))
