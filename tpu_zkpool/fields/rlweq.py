"""Arithmetic mod q = 167772161 (= 40*2^22 + 1) in pure uint32 lanes.

The RLWE word field (reference ``scripts/rlwe_keygen.py:20``). q < 2^28, so
elements fit one uint32; products need 56 bits, which the TPU VPU lacks —
multiplication runs as a 2x14-bit-limb Montgomery (CIOS) using only
14x14->28-bit partial products. ~8 uint32 multiplies per modmul.

All ops are elementwise over arbitrary-shape uint32 arrays (values < q,
Montgomery domain for ``mont_mul``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Q = 167772161
W = 14
M14 = (1 << W) - 1
R = 1 << (2 * W)          # Montgomery R = 2^28
R_MOD_Q = R % Q
R2_MOD_Q = (R * R) % Q
R_INV = pow(R, -1, Q)
Q0 = Q & M14
Q1 = Q >> W
QINV_NEG = (-pow(Q, -1, 1 << W)) % (1 << W)   # -q^-1 mod 2^14

U32 = jnp.uint32


def add(a, b):
    s = a + b
    return jnp.where(s >= Q, s - Q, s)


def sub(a, b):
    return jnp.where(a >= b, a - b, a + Q - b)


def neg(a):
    return jnp.where(a == 0, a, Q - a)


def mont_mul(a, b):
    """a * b * R^-1 mod q (2x14-bit CIOS; all intermediates < 2^30)."""
    a0, a1 = a & M14, a >> W
    b0, b1 = b & M14, b >> W
    t0 = a0 * b0                    # < 2^28
    t1 = a0 * b1 + a1 * b0          # < 2^29
    t2 = a1 * b1                    # < 2^28
    m = (t0 * np.uint32(QINV_NEG)) & M14
    t0 = t0 + m * np.uint32(Q0)     # < 2^29, ≡ 0 mod 2^14
    t1 = t1 + (t0 >> W) + m * np.uint32(Q1)   # < 2^30
    m2 = (t1 * np.uint32(QINV_NEG)) & M14
    t1 = t1 + m2 * np.uint32(Q0)    # ≡ 0 mod 2^14
    t2 = t2 + (t1 >> W) + m2 * np.uint32(Q1)  # < 2q
    return jnp.where(t2 >= Q, t2 - Q, t2)


def to_mont(a):
    return mont_mul(a, jnp.asarray(np.uint32(R2_MOD_Q)))


def from_mont(a):
    return mont_mul(a, jnp.asarray(np.uint32(1)))


def pow_const(a_mont, e: int):
    """a^e (Montgomery in/out) for a Python-int exponent, square&multiply."""
    result = jnp.full_like(a_mont, np.uint32(R_MOD_Q))
    base = a_mont
    while e:
        if e & 1:
            result = mont_mul(result, base)
        base = mont_mul(base, base)
        e >>= 1
    return result
