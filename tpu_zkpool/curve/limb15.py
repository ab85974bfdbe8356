"""15-bit-limb Montgomery arithmetic for the Pallas MSM prefix kernel.

The default register-limb layout (``fields/limbs.py``) is 16 limbs of 16
bits: every 16x16->32-bit partial product nearly fills a uint32 lane, so
each of the 256 products pays its own lo/hi split (&, >>, two adds). This
module trades one extra limb for headroom: 17 limbs of 15 bits, so

- **four raw 30-bit products accumulate per uint32 column** before a
  single lo/hi split (4*(2^15-1)^2 < 2^32), cutting the product phase
  from ~5 to ~2.8 VPU ops per partial product;
- the Montgomery reduction defers its splits too: the m_i * p_j products
  of three consecutive outer iterations accumulate raw (3 per column,
  bound 2^21 + 3*(2^15-1)^2 + carries < 2^32) before one normalization
  sweep over the live column window;
- a **dedicated squaring** computes only the 153 distinct products
  (diagonal + upper triangle, doubled per column) instead of 289;
- ``mul_sub(a, b, c, d) = a*b - c*d`` fuses two products into ONE
  reduction (negate d, sum the column sets) — used for the Jacobian
  Y3 = r*(V - X3) - Y1*HHH.

Domain: these routines work in the R' = 2^255 Montgomery domain (R' =
2^(15*17)), while the rest of the library keeps R = 2^256. Conversion is
a cheap shift by one bit: x*R = 2 * (x*R') mod p, so the prefix kernel
*halves* each streamed-in coordinate while regrouping 16->15-bit limbs
(``load15_from16``) and *doubles* on the way out (``store16_from15``).
Identity (all-zero) encodings survive both conversions as zero.

Replaces the in-circuit MSM gnark runs behind ``sunspot prove``
(``/root/reference/client/proof.helper.ts:64``); same element contract as
``msm/grid.py``'s 16-bit kernels, selected there via ``limb15=True``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.fields.limbs import (
    NLIMB, MASK, WBITS, int_to_limbs, limbs_to_int,
)

NL = 17           # limbs per element
WB = 15           # bits per limb
MK = np.uint32((1 << WB) - 1)

_P_INT = FP.modulus
_P15 = [np.uint32(v) for v in int_to_limbs(_P_INT, NL, WB)]
_P16 = [np.uint32(v) for v in FP.p_limbs]
# -p^-1 mod 2^15
_N015 = np.uint32((-pow(_P_INT, -1, 1 << WB)) % (1 << WB))
# Montgomery one in the R' = 2^255 domain
R15 = (1 << (NL * WB)) % _P_INT
ONE15 = [np.uint32(v) for v in int_to_limbs(R15, NL, WB)]

_NCOL = 2 * NL + 1     # 35 product columns (index 34 is a guard)
_GROUP = 4             # raw 30-bit products per column split


def to15(x: int) -> np.ndarray:
    """Host helper: int -> 17x15-bit limbs (uint32)."""
    return int_to_limbs(x, NL, WB)


def from15(limbs) -> int:
    return limbs_to_int(np.asarray(limbs), WB)


# --------------------------------------------------------------------------
# add / sub / select — same shapes of carry chain as the 16-bit versions.
# --------------------------------------------------------------------------


def cond_sub15(limbs):
    """limbs < 2p -> canonical (< p)."""
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(NL):
        d = limbs[i] - _P15[i] - borrow
        borrow = d >> 31
        diff.append(d & MK)
    return [jnp.where(borrow == 1, o, d) for o, d in zip(limbs, diff)]


def add15(a, b):
    carry = jnp.zeros_like(a[0])
    s = []
    for i in range(NL):
        v = a[i] + b[i] + carry
        s.append(v & MK)
        carry = v >> WB
    return cond_sub15(s)


def dbl15(a):
    return add15(a, a)


def sub15(a, b):
    borrow = jnp.zeros_like(a[0])
    diff = []
    for i in range(NL):
        d = a[i] - b[i] - borrow
        borrow = d >> 31
        diff.append(d & MK)
    carry = jnp.zeros_like(a[0])
    padd = []
    for i in range(NL):
        v = diff[i] + _P15[i] + carry
        padd.append(v & MK)
        carry = v >> WB
    return [jnp.where(borrow == 1, pa, d) for pa, d in zip(padd, diff)]


def neg15(a):
    """p - a for canonical a (a = 0 maps to p, fixed up by cond_sub)."""
    borrow = jnp.zeros_like(a[0])
    out = []
    for i in range(NL):
        d = _P15[i] - a[i] - borrow
        borrow = d >> 31
        out.append(d & MK)
    # a = 0 -> p: run the canonicalizing subtract once
    return cond_sub15(out)


def is_zero15(a):
    acc = a[0]
    for i in range(1, NL):
        acc = acc | a[i]
    return acc == 0


# --------------------------------------------------------------------------
# Product columns. A "column set" is a list of 35 uint32 arrays; entry c
# carries partial sums of weight 2^(15c), each < ~2^21.
# --------------------------------------------------------------------------


def _zero_cols(like):
    return [jnp.zeros_like(like) for _ in range(_NCOL)]


def _acc(cols, c, v):
    cols[c] = v if cols[c] is None else cols[c] + v


def mul_cols15(a, b, cols=None):
    """Accumulate the 289 partial products of a*b into column sums,
    splitting once per group of 4 raw products (same column)."""
    out = [None] * _NCOL if cols is None else cols
    for c in range(2 * NL - 1):
        pairs = [(i, c - i)
                 for i in range(max(0, c - NL + 1), min(NL, c + 1))]
        for g in range(0, len(pairs), _GROUP):
            s = None
            for (i, j) in pairs[g:g + _GROUP]:
                p = a[i] * b[j]
                s = p if s is None else s + p
            _acc(out, c, s & MK)
            _acc(out, c + 1, s >> WB)
    return out


def sqr_cols15(a, cols=None):
    """Column sums of a*a: 17 diagonal + 136 distinct off-diagonal
    products (halved count); off-diagonal column sums are doubled before
    the split."""
    out = [None] * _NCOL if cols is None else cols
    for c in range(2 * NL - 1):
        lo = max(0, c - NL + 1)
        hi = min(NL, c + 1)
        pairs = [(i, c - i) for i in range(lo, hi) if i < c - i]
        # group 2 off-diagonal products: doubled sum < 4*(2^15-1)^2 < 2^32
        for g in range(0, len(pairs), 2):
            s = None
            for (i, j) in pairs[g:g + 2]:
                p = a[i] * a[j]
                s = p if s is None else s + p
            s = s + s
            _acc(out, c, s & MK)
            _acc(out, c + 1, s >> WB)
        if c % 2 == 0:
            i = c // 2
            p = a[i] * a[i]
            _acc(out, c, p & MK)
            _acc(out, c + 1, p >> WB)
    return out


# Reduction flavor: "deferred" batches three outer iterations of raw
# m_i * p_j products before one normalization sweep (fewest ops, but the
# sweeps are long serial carry chains); "classic" splits every product
# immediately (more ops, all independent — shallow critical path).
DEFERRED_REDUCE = False


def reduce15(cols, deferred=None):
    """Montgomery reduction of column sums (each < ~2^22) -> canonical
    17x15-bit limbs of T * 2^-255 mod p.

    Deferred variant: per outer iteration i the 17 raw m_i * p_j products
    accumulate unsplit; every third iteration one normalization sweep
    over the live window [i+1, i+20] restores <2^15 residues. Worst-case
    column before a sweep: 2^22 (inputs + sweep carries) + 3*(2^15-1)^2
    (three raw products) + 2^17 (column-i carry) < 2^32.
    """
    if deferred is None:
        deferred = DEFERRED_REDUCE
    cols = [jnp.zeros_like(cols[0]) if c is None else c for c in cols]
    for i in range(NL):
        m = (cols[i] * _N015) & MK
        if deferred:
            for j in range(NL):
                cols[i + j] = cols[i + j] + m * _P15[j]
            # column i is now ≡ 0 mod 2^15; push its (exact) carry up
            cols[i + 1] = cols[i + 1] + (cols[i] >> WB)
            if i % 3 == 2 or i == NL - 1:
                carry = None
                for c in range(i + 1, min(i + 20, _NCOL - 1)):
                    v = cols[c] if carry is None else cols[c] + carry
                    cols[c] = v & MK
                    carry = v >> WB
                cols[min(i + 20, _NCOL - 1)] += carry
        else:
            for j in range(NL):
                mp = m * _P15[j]
                cols[i + j] = cols[i + j] + (mp & MK)
                cols[i + j + 1] = cols[i + j + 1] + (mp >> WB)
            cols[i + 1] = cols[i + 1] + (cols[i] >> WB)
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in range(NL, 2 * NL):
        v = cols[c] + carry
        out.append(v & MK)
        carry = v >> WB
    return cond_sub15(out)


def mul15(a, b):
    return reduce15(mul_cols15(a, b))


def sqr15(a):
    return reduce15(sqr_cols15(a))


def mul_sub15(a, b, c, d):
    """a*b - c*d mod p with a single Montgomery reduction: the second
    product enters as c * (p - d), so both column sets just add."""
    cols = mul_cols15(a, b)
    return reduce15(mul_cols15(c, neg15(d), cols))


# --------------------------------------------------------------------------
# Domain/radix conversion (kernel-side, on register lists).
# --------------------------------------------------------------------------


def load15_from16(regs16):
    """16x16-bit limbs of x*R (canonical) -> 17x15-bit limbs of x*R',
    R' = R/2: conditionally add p to make the value even, then read the
    15-bit windows shifted one bit up (v >> (15k + 1))."""
    carry = jnp.zeros_like(regs16[0])
    added = []
    for i in range(NLIMB):
        v = regs16[i] + _P16[i] + carry
        added.append(v & MASK)
        carry = v >> WBITS
    odd = (regs16[0] & 1) == 1
    v = [jnp.where(odd, x, y) for x, y in zip(added, regs16)]
    v.append(jnp.zeros_like(v[0]))          # limb 16 guard (p + x < 2^255)
    out = []
    for k in range(NL):
        pos = WB * k + 1
        j, s = pos // WBITS, pos % WBITS
        r = v[j] >> np.uint32(s)
        if s + WB > WBITS:
            r = r | (v[j + 1] << np.uint32(WBITS - s))
        out.append(r & MK)
    return out


def store16_from15(limbs15):
    """17x15-bit limbs of x*R' (canonical) -> 16x16-bit limbs of x*R:
    double mod p, then regroup 15 -> 16 bit windows."""
    d = dbl15(limbs15)
    out = []
    for k in range(NLIMB):
        pos = WBITS * k
        j, s = pos // WB, pos % WB
        r = d[j] >> np.uint32(s)
        if j + 1 < NL:
            r = r | (d[j + 1] << np.uint32(WB - s))
        out.append(r & MASK)
    return out


# --------------------------------------------------------------------------
# Field adapters with the msm/grid.py contract (element = [component],
# component = list of NL arrays).
# --------------------------------------------------------------------------


class L15Fp:
    ncomp = 1
    nlimb = NL

    mul = staticmethod(lambda a, b: [mul15(a[0], b[0])])
    sqr = staticmethod(lambda a: [sqr15(a[0])])
    add = staticmethod(lambda a, b: [add15(a[0], b[0])])
    sub = staticmethod(lambda a, b: [sub15(a[0], b[0])])
    dbl = staticmethod(lambda a: [dbl15(a[0])])
    is_zero = staticmethod(lambda a: is_zero15(a[0]))
    mul_sub = staticmethod(lambda a, b, c, d:
                           [mul_sub15(a[0], b[0], c[0], d[0])])

    @staticmethod
    def zero(like):
        return [[jnp.zeros_like(r) for r in like[0]]]

    @staticmethod
    def one(like):
        return [[jnp.full_like(r, ONE15[l]) for l, r in enumerate(like[0])]]

    @staticmethod
    def select(cond, a, b):
        return [[jnp.where(cond, x, y) for x, y in zip(ca, cb)]
                for ca, cb in zip(a, b)]


class L15Fp2:
    """Fp2 = Fp[u]/(u^2 + 1), Karatsuba (3 Fp column sets, 3 reductions)."""

    ncomp = 2
    nlimb = NL

    @staticmethod
    def mul(a, b):
        t0 = mul15(a[0], b[0])
        t1 = mul15(a[1], b[1])
        sa = add15(a[0], a[1])
        sb = add15(b[0], b[1])
        t2 = mul15(sa, sb)
        return [sub15(t0, t1), sub15(sub15(t2, t0), t1)]

    @staticmethod
    def sqr(a):
        return L15Fp2.mul(a, a)

    @staticmethod
    def mul_sub(a, b, c, d):
        m1 = L15Fp2.mul(a, b)
        m2 = L15Fp2.mul(c, d)
        return L15Fp2.sub(m1, m2)

    add = staticmethod(lambda a, b: [add15(x, y) for x, y in zip(a, b)])
    sub = staticmethod(lambda a, b: [sub15(x, y) for x, y in zip(a, b)])
    dbl = staticmethod(lambda a: [dbl15(x) for x in a])

    @staticmethod
    def is_zero(a):
        return is_zero15(a[0]) & is_zero15(a[1])

    @staticmethod
    def zero(like):
        return [[jnp.zeros_like(r) for r in c] for c in like]

    @staticmethod
    def one(like):
        return [[jnp.full_like(r, ONE15[l]) for l, r in enumerate(like[0])],
                [jnp.zeros_like(r) for r in like[1]]]

    @staticmethod
    def select(cond, a, b):
        return [[jnp.where(cond, x, y) for x, y in zip(ca, cb)]
                for ca, cb in zip(a, b)]


def field15(ncomp):
    return L15Fp if ncomp == 1 else L15Fp2
