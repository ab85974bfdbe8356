"""Batched BN254 optimal-ate pairing on TPU.

Mirrors the validated Python reference (``refimpl/pairing_ref.py``) with all
arithmetic on batched limb arrays: Miller loop as a `lax.scan` over the
static 6x+2 bit string (double-step always, add-step under the scanned bit),
line evaluations in affine G2 with batched Fp2 inversions, sparse
l0+l1*w+l3*w^3 multiplications, and the final exponentiation as a scan over
the fixed (p^12-1)/r exponent bits.

This is the compute core of batched Groth16 verification
(configs[2] in BASELINE.json): hundreds of proofs verify in one batch at
the cost of one serial pairing schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.bn254 import FP_MOD as P, FR_MOD, BN_X
from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.curve import tower as tw
from tpu_zkpool.refimpl import pairing_ref as pr

ATE_BITS = [int(b) for b in bin(6 * BN_X + 2)[3:]]  # MSB dropped
FINAL_EXP = (P**12 - 1) // FR_MOD


def _f2_const(x) -> tuple:
    """Host Fp2 constant -> Montgomery limb pair (broadcastable)."""
    return (jnp.asarray(FP.to_mont([x[0]])[0]), jnp.asarray(FP.to_mont([x[1]])[0]))


_XI_P_13 = _f2_const(pr._XI_P_13)
_XI_P_12 = _f2_const(pr._XI_P_12)


def _line(t, q, px, py, is_double: bool):
    """Line through t,q (affine Fp2 points) evaluated at (px, py) in G1.

    Returns (new_t, (l0, l1, l3)). Batched; caller guarantees the
    non-degenerate case (valid subgroup inputs during the Miller loop).
    """
    tx, ty = t
    qx, qy = q
    if is_double:
        num = tw.f2_scalar_small(tw.f2_sqr(tx), 3)
        den = tw.f2_add(ty, ty)
    else:
        num = tw.f2_sub(qy, ty)
        den = tw.f2_sub(qx, tx)
    lam = tw.f2_mul(num, tw.f2_inv(den))
    x3 = tw.f2_sub(tw.f2_sub(tw.f2_sqr(lam), tx), qx)
    y3 = tw.f2_sub(tw.f2_mul(lam, tw.f2_sub(tx, x3)), ty)
    l0 = (py, FP.zeros(py.shape[:-1]))
    l1 = tw.f2_neg((FP.mont_mul(lam[0], px), FP.mont_mul(lam[1], px)))
    l3 = tw.f2_sub(tw.f2_mul(lam, tx), ty)
    return (x3, y3), (l0, l1, l3)


def _g2_frobenius(q):
    x, y = q
    return (tw.f2_mul(tw.f2_conj(x), _XI_P_13),
            tw.f2_mul(tw.f2_conj(y), _XI_P_12))


def miller_loop(px, py, qx, qy):
    """f_{6x+2,Q}(P) with Frobenius end-steps.

    px, py: uint32[..., 16] G1 affine (Montgomery).
    qx, qy: Fp2 pairs of the same batch shape. Returns a batched Fp12.
    """
    bits = jnp.asarray(ATE_BITS, dtype=jnp.uint32)
    bshape = px.shape[:-1]
    f0 = tw.f12_one(bshape)
    q = (qx, qy)

    def body(carry, bit):
        f, t = carry
        f = tw.f12_sqr(f)
        t, (l0, l1, l3) = _line(t, t, px, py, True)
        f = tw.f12_mul_sparse_line(f, l0, l1, l3)

        t_add, (a0, a1, a3) = _line(t, q, px, py, False)
        f_add = tw.f12_mul_sparse_line(f, a0, a1, a3)
        take = (bit == 1)

        def sel2(a, b):
            return jnp.where(take[..., None] if take.ndim else take, a, b)

        f = tuple((sel2(x[0], y[0]), sel2(x[1], y[1]))
                  for x, y in zip(f_add, f))
        t = tuple((sel2(x[0], y[0]), sel2(x[1], y[1]))
                  for x, y in zip(t_add, t))
        return (f, t), None

    (f, t), _ = jax.lax.scan(body, (f0, q), bits)

    q1 = _g2_frobenius(q)
    q2 = _g2_frobenius(q1)
    q2 = (q2[0], tw.f2_neg(q2[1]))
    t, (l0, l1, l3) = _line(t, q1, px, py, False)
    f = tw.f12_mul_sparse_line(f, l0, l1, l3)
    t, (l0, l1, l3) = _line(t, q2, px, py, False)
    f = tw.f12_mul_sparse_line(f, l0, l1, l3)
    return f


def f12_pow_const(a, e: int):
    """a^e for a fixed Python-int exponent via a bit scan (MSB first)."""
    bits = jnp.asarray([int(b) for b in bin(e)[2:]], dtype=jnp.uint32)

    def body(acc, bit):
        acc = tw.f12_sqr(acc)
        mul = tw.f12_mul(acc, a)
        take = (bit == 1)
        acc = tuple(
            (jnp.where(take, x[0], y[0]), jnp.where(take, x[1], y[1]))
            for x, y in zip(mul, acc)
        )
        return acc, None

    out, _ = jax.lax.scan(body, tw.f12_one(a[0][0].shape[:-1]), bits)
    return out


def final_exponentiation(f):
    return f12_pow_const(f, FINAL_EXP)


def pairing_product_is_one(g1_points, g2_points) -> jnp.ndarray:
    """Batched check prod_i e(P_i, Q_i) == 1.

    g1_points: list of (px, py) uint32[..., 16]; g2_points: matching list of
    Fp2 affine pairs. Returns bool[...]
    """
    f = None
    for (px, py), q in zip(g1_points, g2_points):
        ml = miller_loop(px, py, q[0], q[1])
        f = ml if f is None else tw.f12_mul(f, ml)
    return tw.f12_eq_one(final_exponentiation(f))


# ----------------------------------------------------------- host helpers

def g1_to_limbs(pts):
    xs = FP.to_mont(np.asarray([p[0] for p in pts], dtype=object))
    ys = FP.to_mont(np.asarray([p[1] for p in pts], dtype=object))
    return jnp.asarray(xs), jnp.asarray(ys)


def g2_to_limbs(pts):
    def col(i, j):
        return jnp.asarray(FP.to_mont(
            np.asarray([p[i][j] for p in pts], dtype=object)))
    return ((col(0, 0), col(0, 1)), (col(1, 0), col(1, 1)))
