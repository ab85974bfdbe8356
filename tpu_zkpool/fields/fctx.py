"""Generic multi-limb Montgomery field arithmetic over a prime modulus.

A :class:`FieldCtx` packages the per-modulus constants (limbs of p, the
Montgomery factor n0' = -p^-1 mod 2^16, R and R^2 mod p) together with
batched JAX ops. All ops operate on ``uint32[..., 16]`` arrays in the
Montgomery domain and broadcast over leading batch axes, so a single call
vectorizes thousands of independent field operations across the VPU —
the TPU-native replacement for the reference's per-element bigint loops
(e.g. ``scripts/rlwe_keygen.py:32-42``, ``client/merkle.ts``).

Design notes (SURVEY.md §7.3, hard part #1):

- 16x16-bit limb products fit exactly in a uint32 lane — no 64-bit multiply
  needed anywhere.
- Multiplication is product-scanning (schoolbook columns) into a 33-column
  uint32 accumulator where every column stays < 2^22, followed by an
  interleaved Montgomery reduction (16 sequential m_i = acc_i * n0' steps).
- Exponentiation (inversion via Fermat) runs as a `lax.scan` over exponent
  bits so the traced graph stays small.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.limbs import NLIMB, WBITS, MASK, int_to_limbs, ints_to_limbs, limbs_to_ints
from tpu_zkpool.fields import bn254

U32 = jnp.uint32


def _np_u32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint32)


@dataclass(frozen=True, eq=False)
class FieldCtx:
    """Montgomery arithmetic context for a prime modulus p < 2^(16*NLIMB - 2)."""

    modulus: int
    name: str = "F"
    # Unrolled carry/borrow/reduction loops instead of lax.scan: bigger
    # traces (don't instantiate hundreds of ops) but XLA fuses them into a
    # few kernels — crucial for SMALL-batch serial paths (e.g. the MSM
    # bucket reduction), where scan-based ops cost ~ms per step in launch
    # overhead.
    unrolled: bool = False

    # Derived (filled in __post_init__ via object.__setattr__).
    p_limbs: np.ndarray = field(init=False, repr=False)
    n0: int = field(init=False)          # -p^-1 mod 2^16
    r_mod_p: int = field(init=False)     # 2^256 mod p  (Montgomery R)
    r2_mod_p: int = field(init=False)    # R^2 mod p
    r_inv: int = field(init=False)       # R^-1 mod p

    def __post_init__(self):
        p = self.modulus
        assert p % 2 == 1 and p < 1 << (WBITS * NLIMB - 2)
        object.__setattr__(self, "p_limbs", int_to_limbs(p))
        p_inv_w = pow(p, -1, 1 << WBITS)
        object.__setattr__(self, "n0", ((1 << WBITS) - p_inv_w) % (1 << WBITS))
        R = 1 << (WBITS * NLIMB)
        object.__setattr__(self, "r_mod_p", R % p)
        object.__setattr__(self, "r2_mod_p", (R * R) % p)
        object.__setattr__(self, "r_inv", pow(R, -1, p))

    # ---------------------------------------------------------------- host IO

    def to_mont(self, xs) -> np.ndarray:
        """Python ints (any nesting) -> Montgomery-domain limbs uint32[...,16]."""
        xs = np.asarray(xs, dtype=object)
        R = 1 << (WBITS * NLIMB)
        flat = [(int(v) % self.modulus) * R % self.modulus for v in xs.reshape(-1)]
        return ints_to_limbs(np.asarray(flat, dtype=object).reshape(xs.shape))

    def from_mont(self, limbs) -> np.ndarray:
        """Montgomery-domain limbs -> object ndarray of canonical ints."""
        vals = limbs_to_ints(np.asarray(limbs))
        flat = [int(v) * self.r_inv % self.modulus for v in vals.reshape(-1)]
        return np.asarray(flat, dtype=object).reshape(vals.shape)

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(shape + (NLIMB,), dtype=U32)

    def ones_mont(self, shape=()) -> jnp.ndarray:
        """Montgomery-domain 1 (= R mod p), broadcast to shape."""
        one = jnp.asarray(int_to_limbs(self.r_mod_p), dtype=U32)
        return jnp.broadcast_to(one, shape + (NLIMB,))

    # ------------------------------------------------------------ primitives

    @property
    def _pj(self) -> jnp.ndarray:
        return jnp.asarray(self.p_limbs, dtype=U32)

    def _borrow_sub(self, a, b):
        """(a - b) over 16 limbs; returns (diff, borrow_out) with borrow 0/1.

        The borrow chain runs as a lax.scan over the limb axis to keep the
        traced graph tiny (compile time matters: these ops are instantiated
        hundreds of times inside hash/curve kernels).
        """
        bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        aT = jnp.moveaxis(jnp.broadcast_to(a, bshape + (NLIMB,)), -1, 0)
        bT = jnp.moveaxis(jnp.broadcast_to(b, bshape + (NLIMB,)), -1, 0)

        def step(borrow, ab):
            ai, bi = ab
            # Underflow wraps uint32; operands < 2^16 so wrap puts d >= 2^31.
            d = ai - bi - borrow
            return d >> 31, d & MASK

        if self.unrolled:
            borrow = jnp.zeros_like(aT[0])
            outs = []
            for i in range(NLIMB):
                borrow, d = step(borrow, (aT[i], bT[i]))
                outs.append(d)
            return jnp.stack(outs, axis=-1), borrow
        # zeros_like keeps shard_map varying-axis types consistent with data
        borrow, diffT = jax.lax.scan(step, jnp.zeros_like(aT[0]), (aT, bT))
        return jnp.moveaxis(diffT, 0, -1), borrow

    def _carry_add(self, a, b, extra=None):
        """(a + b [+ extra]) limbwise with carry chain; result may be >= p."""
        bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        aT = jnp.moveaxis(jnp.broadcast_to(a, bshape + (NLIMB,)), -1, 0)
        bT = jnp.moveaxis(jnp.broadcast_to(b, bshape + (NLIMB,)), -1, 0)

        def step(carry, ab):
            v = ab[0] + ab[1] + carry
            return v >> WBITS, v & MASK

        if self.unrolled:
            carry = jnp.zeros_like(aT[0])
            outs = []
            for i in range(NLIMB):
                carry, s = step(carry, (aT[i], bT[i]))
                outs.append(s)
            return jnp.stack(outs, axis=-1)
        _, sT = jax.lax.scan(step, jnp.zeros_like(aT[0]), (aT, bT))
        return jnp.moveaxis(sT, 0, -1)

    def _cond_sub_p(self, a):
        """a - p if a >= p else a; a must be < 2p and fit in 16 limbs."""
        diff, borrow = self._borrow_sub(a, jnp.broadcast_to(self._pj, a.shape))
        take_diff = (borrow == 0)[..., None]
        return jnp.where(take_diff, diff, a)

    # ------------------------------------------------------------ public ops

    def add(self, a, b):
        """Modular addition (works in either domain)."""
        # a + b < 2p < 2^255 so no carry out of limb 15 for canonical inputs.
        return self._cond_sub_p(self._carry_add(a, b))

    def sub(self, a, b):
        """Modular subtraction."""
        diff, borrow = self._borrow_sub(a, b)
        padd = self._carry_add(diff, jnp.broadcast_to(self._pj, diff.shape))
        return jnp.where((borrow == 1)[..., None], padd, diff)

    def neg(self, a):
        """Modular negation (p - a, with -0 = 0)."""
        diff, _ = self._borrow_sub(jnp.broadcast_to(self._pj, a.shape), a)
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        return jnp.where(is_zero, jnp.zeros_like(a), diff)

    def mul_cols(self, a, b):
        """Unreduced product columns of a*b: uint32[..., 33], col < 2^21.

        Lazy-reduction building block: columns of several products may be
        ADDED together (bounds: k products -> columns < k * 2^21; keep
        k <= 64) before a single :meth:`reduce_cols`."""
        bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, bshape + (NLIMB,))
        b = jnp.broadcast_to(b, bshape + (NLIMB,))
        npad = len(bshape)
        W = 2 * NLIMB + 1
        parts = []
        for i in range(NLIMB):
            p = a[..., i : i + 1] * b
            pad = [(0, 0)] * npad
            parts.append(jnp.pad(p & MASK, pad + [(i, W - NLIMB - i)]))
            parts.append(jnp.pad(p >> WBITS, pad + [(i + 1, W - NLIMB - i - 1)]))
        return jnp.sum(jnp.stack(parts, 0), axis=0, dtype=U32)

    def reduce_cols(self, acc, n_sub: int = 1):
        """Montgomery-reduce 33 columns -> canonical 16 limbs.

        ``n_sub`` conditional subtractions of p at the end: 1 suffices for a
        single product (T < 2p); 2 for up to ~6 accumulated products, 3 for
        up to 12 (the hard cap: T must stay < 2^256, i.e. < ~4.2p)."""
        bshape = acc.shape[:-1]
        n0 = np.uint32(self.n0)
        pj = self._pj

        def red_step(acc, _):
            m = (acc[..., 0] * n0) & MASK
            mp = m[..., None] * pj
            acc = acc.at[..., 0:NLIMB].add(mp & MASK)
            acc = acc.at[..., 1 : NLIMB + 1].add(mp >> WBITS)
            acc = acc.at[..., 1].add(acc[..., 0] >> WBITS)
            acc = jnp.roll(acc, -1, axis=-1)
            acc = acc.at[..., -1].set(0)
            return acc, None

        if self.unrolled:
            for _ in range(NLIMB):
                acc, _ = red_step(acc, None)
        else:
            acc, _ = jax.lax.scan(red_step, acc, None, length=NLIMB)
        colsT = jnp.moveaxis(acc[..., :NLIMB], -1, 0)

        def carry_step(carry, col):
            v = col + carry
            return v >> WBITS, v & MASK

        if self.unrolled:
            carry = jnp.zeros_like(colsT[0])
            outs = []
            for i in range(NLIMB):
                carry, s = carry_step(carry, colsT[i])
                outs.append(s)
            res = jnp.stack(outs, axis=-1)
        else:
            _, limbsT = jax.lax.scan(carry_step, jnp.zeros_like(colsT[0]), colsT)
            res = jnp.moveaxis(limbsT, 0, -1)
        for _ in range(n_sub):
            res = self._cond_sub_p(res)
        return res

    def mont_mul(self, a, b):
        """Montgomery product: a * b * R^-1 mod p.

        Both inputs uint32[..., 16]; leading axes broadcast.
        """
        bshape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, bshape + (NLIMB,))
        b = jnp.broadcast_to(b, bshape + (NLIMB,))
        npad = len(bshape)
        W = 2 * NLIMB + 1

        # --- product columns: col[c] = sum_{i+j=c} lo(a_i b_j) + hi shifted;
        # every column < 32 * 2^16 = 2^21, well within uint32 ---
        parts = []
        for i in range(NLIMB):
            p = a[..., i : i + 1] * b  # (..., 16) full 32-bit products
            pad = [(0, 0)] * npad
            parts.append(jnp.pad(p & MASK, pad + [(i, W - NLIMB - i)]))
            parts.append(jnp.pad(p >> WBITS, pad + [(i + 1, W - NLIMB - i - 1)]))
        acc = jnp.sum(jnp.stack(parts, 0), axis=0, dtype=U32)

        # --- Montgomery reduction as a scan: at step i the accumulator is
        # kept relative (column 0 = original column i); each step cancels
        # the lowest column with m = acc_0 * (-p^-1) mod 2^16, adds m*p,
        # pushes the retired column's carry up, and shifts left. Columns
        # stay < 2^22. ---
        n0 = np.uint32(self.n0)
        pj = self._pj

        def red_step(acc, _):
            m = (acc[..., 0] * n0) & MASK
            mp = m[..., None] * pj
            acc = acc.at[..., 0:NLIMB].add(mp & MASK)
            acc = acc.at[..., 1 : NLIMB + 1].add(mp >> WBITS)
            acc = acc.at[..., 1].add(acc[..., 0] >> WBITS)
            acc = jnp.roll(acc, -1, axis=-1)
            acc = acc.at[..., -1].set(0)
            return acc, None

        if self.unrolled:
            for _ in range(NLIMB):
                acc, _ = red_step(acc, None)
        else:
            acc, _ = jax.lax.scan(red_step, acc, None, length=NLIMB)

        # --- final carry propagation: T < 2p < 2^255 fits 16 limbs ---
        colsT = jnp.moveaxis(acc[..., :NLIMB], -1, 0)

        def carry_step(carry, col):
            v = col + carry
            return v >> WBITS, v & MASK

        if self.unrolled:
            carry = jnp.zeros_like(colsT[0])
            outs = []
            for i in range(NLIMB):
                carry, s = carry_step(carry, colsT[i])
                outs.append(s)
            res = jnp.stack(outs, axis=-1)
        else:
            _, limbsT = jax.lax.scan(carry_step, jnp.zeros_like(colsT[0]), colsT)
            res = jnp.moveaxis(limbsT, 0, -1)
        return self._cond_sub_p(res)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def mont_pow(self, a, e: int):
        """a^e in Montgomery domain (e a Python int, fixed at trace time)."""
        if e == 0:
            return self.ones_mont(a.shape[:-1])
        bits = [(e >> i) & 1 for i in range(e.bit_length())]
        bits_arr = jnp.asarray(bits[::-1], dtype=jnp.uint32)  # MSB first

        def body(acc, bit):
            acc = self.mont_mul(acc, acc)
            mul = self.mont_mul(acc, a)
            acc = jnp.where((bit == 1), mul, acc)
            return acc, None

        # Start from 1 (Montgomery), scan all bits MSB->LSB.
        init = self.ones_mont(a.shape[:-1])
        out, _ = jax.lax.scan(body, init, bits_arr)
        return out

    def inv(self, a):
        """Modular inverse via Fermat: a^(p-2). Montgomery in, Montgomery out."""
        return self.mont_pow(a, self.modulus - 2)

    def select(self, cond, a, b):
        """Elementwise select on field elements; cond shape = batch shape."""
        return jnp.where(cond[..., None], a, b)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)


# Shared contexts for the two BN254 fields.
FR = FieldCtx(bn254.FR_MOD, name="Fr")
FP = FieldCtx(bn254.FP_MOD, name="Fp")
# Unrolled variants for small-batch serial paths (same math, fused traces).
FR_U = FieldCtx(bn254.FR_MOD, name="Fr", unrolled=True)
FP_U = FieldCtx(bn254.FP_MOD, name="Fp", unrolled=True)
