"""Batched Fp2 / Fp12 tower arithmetic on TPU limbs.

Elements broadcast over leading batch axes:
- Fp2: tuple (c0, c1) of uint32[..., 16] Montgomery arrays, u^2 = -1.
- Fp12: tuple of 6 Fp2 coefficients over w, w^6 = xi = 9 + u.

Multiplications use the lazy-accumulation API (``FP.mul_cols`` /
``reduce_cols``): all partial products of an Fp12 operation accumulate in
the 33-column domain and reduce once per output component, so a full Fp12
multiply costs 144 batched limb products + a handful of reductions — the
batched-TPU replacement for gnark's tower arithmetic inside Groth16
verification (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_zkpool.fields.fctx import FP

# ------------------------------------------------------------------- Fp2


def f2_add(a, b):
    return (FP.add(a[0], b[0]), FP.add(a[1], b[1]))


def f2_sub(a, b):
    return (FP.sub(a[0], b[0]), FP.sub(a[1], b[1]))


def f2_neg(a):
    return (FP.neg(a[0]), FP.neg(a[1]))


def f2_conj(a):
    return (a[0], FP.neg(a[1]))


def f2_mul(a, b):
    """(a0 + a1 u)(b0 + b1 u): 4 products, lazy-accumulated imaginaries."""
    t0 = FP.mul_cols(a[0], b[0])
    t1 = FP.mul_cols(a[1], b[1])
    m0 = FP.reduce_cols(t0)
    m1 = FP.reduce_cols(t1)
    c0 = FP.sub(m0, m1)
    c1 = FP.reduce_cols(FP.mul_cols(a[0], b[1]) + FP.mul_cols(a[1], b[0]),
                        n_sub=2)
    return (c0, c1)


def f2_sqr(a):
    # (a0^2 - a1^2) + 2 a0 a1 u
    s = FP.mont_mul(FP.add(a[0], a[1]), FP.sub(a[0], a[1]))
    c1 = FP.mont_mul(a[0], a[1])
    return (s, FP.add(c1, c1))


def f2_scalar_small(a, k: int):
    """k*a for a small non-negative int k (repeated doubling)."""
    acc = None
    base = a
    while k:
        if k & 1:
            acc = base if acc is None else f2_add(acc, base)
        base = f2_add(base, base)
        k >>= 1
    return acc


def f2_mul_by_xi(a):
    """a * (9 + u) = (9 a0 - a1) + (a0 + 9 a1) u."""
    a9 = f2_scalar_small(a, 9)
    return (FP.sub(a9[0], a[1]), FP.add(a[0], a9[1]))


def f2_inv(a):
    d = FP.add(FP.mont_mul(a[0], a[0]), FP.mont_mul(a[1], a[1]))
    di = FP.inv(d)
    return (FP.mont_mul(a[0], di), FP.neg(FP.mont_mul(a[1], di)))


def f2_zero(shape=()):
    return (FP.zeros(shape), FP.zeros(shape))


def f2_one(shape=()):
    return (FP.ones_mont(shape), FP.zeros(shape))


def f2_is_zero(a):
    return FP.is_zero(a[0]) & FP.is_zero(a[1])


# ------------------------------------------------------------------ Fp12


def f12_one(shape=()):
    return (f2_one(shape),) + tuple(f2_zero(shape) for _ in range(5))


def f12_conj(a):
    return tuple(c if i % 2 == 0 else f2_neg(c) for i, c in enumerate(a))


def f12_mul(a, b):
    """Schoolbook over w with lazy accumulation per output component.

    For each output k: direct terms i+j = k (<= 6 products) accumulate in
    columns; overflow terms i+j = k+6 accumulate separately and get one xi
    multiplication after reduction. Real parts of an fp2 product need
    separate plus/minus accumulators (a0b0 vs a1b1).
    """
    def acc_block(pairs):
        """Sum_{(i,j) in pairs} a_i * b_j as an Fp2 element (lazy)."""
        if not pairs:
            return None
        pp = None  # a0b0 columns
        pm = None  # a1b1 columns
        pi = None  # imaginary columns
        for i, j in pairs:
            a0, a1 = a[i]
            b0, b1 = b[j]
            t = FP.mul_cols(a0, b0)
            pp = t if pp is None else pp + t
            t = FP.mul_cols(a1, b1)
            pm = t if pm is None else pm + t
            t = FP.mul_cols(a0, b1) + FP.mul_cols(a1, b0)
            pi = t if pi is None else pi + t
        n_sub = 2 if len(pairs) <= 6 else 3
        c0 = FP.sub(FP.reduce_cols(pp, n_sub), FP.reduce_cols(pm, n_sub))
        c1 = FP.reduce_cols(pi, min(3, n_sub + 1))
        return (c0, c1)

    out = []
    for k in range(6):
        direct = [(i, k - i) for i in range(6) if 0 <= k - i < 6]
        overfl = [(i, k + 6 - i) for i in range(6) if 0 <= k + 6 - i < 6]
        d = acc_block(direct)
        o = acc_block(overfl)
        if o is not None:
            o = f2_mul_by_xi(o)
            d = f2_add(d, o) if d is not None else o
        out.append(d)
    return tuple(out)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_mul_sparse_line(f, l0, l1, l3):
    """f * (l0 + l1 w + l3 w^3) — the Miller-loop line shape.

    l0/l1/l3 are Fp2; only 18 fp2-products instead of 36.
    """
    b = (l0, l1, f2_zero(l0[0].shape[:-1]), l3,
         f2_zero(l0[0].shape[:-1]), f2_zero(l0[0].shape[:-1]))
    return f12_mul(f, b)


def f12_eq_one(a) -> jnp.ndarray:
    one = f12_one(a[0][0].shape[:-1])
    ok = None
    for (c0, c1), (o0, o1) in zip(a, one):
        e = FP.eq(c0, o0) & FP.eq(c1, o1)
        ok = e if ok is None else (ok & e)
    return ok
