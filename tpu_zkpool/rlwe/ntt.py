"""Negacyclic NTT over q = 167772161 for the RLWE ring Z_q[x]/(x^n + 1).

TPU-first design (SURVEY.md §5 "long-context" analogue):

- psi-twist: multiply coefficient i by psi^i (psi a primitive 2n-th root of
  unity; q - 1 = 2^25 * 5 so roots up to order 2^25 exist), then a standard
  cyclic NTT of size n. Forward uses decimation-in-frequency
  (natural -> bit-reversed), inverse uses decimation-in-time
  (bit-reversed -> natural), so no explicit bit-reversal permutation is
  needed anywhere — pointwise products pair up correctly.
- Butterfly stages are reshape + slice ops over the last axis, batched over
  any leading axes; all multiplies are 2x14-bit Montgomery
  (``tpu_zkpool.fields.rlweq``).

Replaces the reference's schoolbook negacyclic loops
(``scripts/rlwe_keygen.py:32-42``) at O(n log n), bit-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields import rlweq
from tpu_zkpool.fields.rlweq import Q, R_MOD_Q, R2_MOD_Q


def _find_generator(q: int = Q) -> int:
    factors = [2, 5]  # q - 1 = 2^25 * 5
    for g in range(2, 100):
        if all(pow(g, (q - 1) // f, q) != 1 for f in factors):
            return g
    raise RuntimeError("no generator found")


@functools.lru_cache(maxsize=None)
def _tables(n: int):
    """Host-side twiddle tables (Montgomery domain) for size-n negacyclic NTT."""
    g = _find_generator()
    psi = pow(g, (Q - 1) // (2 * n), Q)
    omega = psi * psi % Q
    psi_inv = pow(psi, -1, Q)
    omega_inv = pow(omega, -1, Q)
    n_inv = pow(n, -1, Q)

    def mont(x):
        return np.uint32(x * rlweq.R % Q)

    # Convention: DATA stays in the plain domain; every constant table is
    # pre-multiplied by R so mont_mul(data, table) = data * const exactly.
    # twist[i] = psi^i * R
    twist = np.array([pow(psi, i, Q) * rlweq.R % Q for i in range(n)], dtype=np.uint32)
    # untwist[i] = psi^-i * n^-1 * R
    untwist = np.array(
        [pow(psi_inv, i, Q) * n_inv % Q * rlweq.R % Q for i in range(n)],
        dtype=np.uint32,
    )
    # Stage twiddles for DIF forward: stage with half-block h uses
    # w^(n/(2h) * j), j = 0..h-1 — store per stage (Montgomery).
    fwd = []
    h = n // 2
    while h >= 1:
        step = n // (2 * h)
        fwd.append(
            np.array([pow(omega, step * j, Q) * rlweq.R % Q for j in range(h)],
                     dtype=np.uint32)
        )
        h //= 2
    # DIT inverse stages run in the reverse order (h = 1 .. n/2).
    inv = []
    h = 1
    while h <= n // 2:
        step = n // (2 * h)
        inv.append(
            np.array([pow(omega_inv, step * j, Q) * rlweq.R % Q for j in range(h)],
                     dtype=np.uint32)
        )
        h *= 2
    return twist, untwist, fwd, inv


def forward(x: jnp.ndarray) -> jnp.ndarray:
    """Negacyclic forward NTT: uint32[..., n] (< q) -> plain-domain
    spectrum in bit-reversed order (twiddle tables carry the R factors)."""
    n = x.shape[-1]
    twist, _, fwd, _ = _tables(n)
    y = rlweq.mont_mul(x, jnp.asarray(twist))  # x * psi^i (plain domain)
    for tw in fwd:
        h = tw.shape[0]
        blocks = y.reshape(y.shape[:-1] + (n // (2 * h), 2 * h))
        u = blocks[..., :h]
        v = blocks[..., h:]
        s = rlweq.add(u, v)
        d = rlweq.mont_mul(rlweq.sub(u, v), jnp.asarray(tw))
        y = jnp.concatenate([s, d], axis=-1).reshape(y.shape)
    return y


def inverse(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`forward`: bit-reversed spectrum -> uint32[..., n] < q."""
    n = y.shape[-1]
    _, untwist, _, inv = _tables(n)
    x = y
    for tw in inv:
        h = tw.shape[0]
        blocks = x.reshape(x.shape[:-1] + (n // (2 * h), 2 * h))
        u = blocks[..., :h]
        v = rlweq.mont_mul(blocks[..., h:], jnp.asarray(tw))
        x = jnp.concatenate([rlweq.add(u, v), rlweq.sub(u, v)], axis=-1).reshape(
            x.shape
        )
    # untwist = psi^-i * n^-1 * R, so mont_mul yields exactly x * psi^-i / n.
    return rlweq.mont_mul(x, jnp.asarray(untwist))


def negacyclic_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Negacyclic product of uint32[..., n] polynomials mod q (batched)."""
    fa = forward(a)
    fb = forward(b)
    prod = rlweq.mont_mul(fa, fb)        # fa * fb * R^-1 ...
    prod = rlweq.mont_mul(prod, jnp.asarray(np.uint32(R2_MOD_Q)))  # ... * R^2 * R^-1
    return inverse(prod)
