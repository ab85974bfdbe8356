"""Windowed fixed-base scalar multiplication on device.

The TPU equivalent of Noir's ``std::embedded_curve_ops::fixed_base_scalar_mul``
(``noir_circuit/src/main.nr:60``) and noble-curves' identity keygen
(``client/merkle.ts:104``): a per-base table of window multiples
``T[w][d] = d * 2^(cw) * G`` is precomputed once on the host, and a batch
of scalars reduces to ``n_windows`` table gathers + batched complete
Jacobian adds — no doublings on the scalar path at all.

Works for any a = 0 curve handled by ``CurveOps`` (the embedded identity
curve over Fr and BN254 G1 over Fp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.curve.weierstrass import CurveOps, EMBEDDED
from tpu_zkpool.fields.limbs import NLIMB


class FixedBaseTable:
    """Host-precomputed window table for one base point."""

    def __init__(self, curve: CurveOps, base=None, c: int = 8,
                 nbits: int = 256):
        self.curve = curve
        self.c = c
        self.n_windows = -(-nbits // c)
        base = base if base is not None else curve.gen
        rows = 1 << c

        # host table of affine multiples (python ints; O(2^c * W) adds)
        def aff_add(p, q):
            if p is None:
                return q
            if q is None:
                return p
            F = curve.F.modulus
            (x1, y1), (x2, y2) = p, q
            if x1 == x2 and (y1 + y2) % F == 0:
                return None
            if p == q:
                lam = 3 * x1 * x1 * pow(2 * y1, -1, F) % F
            else:
                lam = (y2 - y1) * pow(x2 - x1, -1, F) % F
            x3 = (lam * lam - x1 - x2) % F
            return (x3, (lam * (x1 - x3) - y1) % F)

        table = np.empty((self.n_windows, rows), dtype=object)
        win_base = base
        for w in range(self.n_windows):
            acc = None
            for d in range(rows):
                table[w, d] = acc
                acc = aff_add(acc, win_base)
            for _ in range(c):
                win_base = aff_add(win_base, win_base)
            table[w, 0] = None  # identity
        # device arrays: X/Y Montgomery, Z = R (or 0 for the identity slot)
        xs = [[p[0] if p else 0 for p in row] for row in table]
        ys = [[p[1] if p else 0 for p in row] for row in table]
        zm = np.asarray([[1 if p else 0 for p in row] for row in table],
                        dtype=np.uint32)
        self.tx = jnp.asarray(curve.F.to_mont(np.asarray(xs, dtype=object)))
        self.ty = jnp.asarray(curve.F.to_mont(np.asarray(ys, dtype=object)))
        self.tz = curve.F.ones_mont((self.n_windows, rows)) * zm[..., None]

    def mul(self, digits: jnp.ndarray):
        """[k]base for uint32[B, n_windows] window digits (LSB window 0).
        Returns a Jacobian (X, Y, Z) batch, uint32[B, 16] each."""
        return _fixed_mul(self.curve, self.tx, self.ty, self.tz, digits)

    def digits(self, ks) -> np.ndarray:
        """Host: int scalars -> uint32[B, n_windows] window digits."""
        ks = [int(k) for k in np.asarray(ks, dtype=object).reshape(-1)]
        out = np.zeros((len(ks), self.n_windows), dtype=np.uint32)
        mask = (1 << self.c) - 1
        for i, k in enumerate(ks):
            for w in range(self.n_windows):
                out[i, w] = (k >> (self.c * w)) & mask
        return out

    def mul_ints(self, ks):
        return self.mul(jnp.asarray(self.digits(ks)))


@functools.partial(jax.jit, static_argnums=(0,))
def _fixed_mul(curve, tx, ty, tz, digits):
    digitsT = jnp.moveaxis(digits, -1, 0)          # (W, B)

    def step(acc, wd):
        w, d = wd
        P = (tx[w][d], ty[w][d], tz[w][d])         # gather (B, 16) each
        return curve.add(acc, P), None

    B = digits.shape[0]
    acc, _ = jax.lax.scan(
        step, curve.identity((B,)),
        (jnp.arange(digitsT.shape[0]), digitsT))
    return acc


@functools.lru_cache(maxsize=None)
def embedded_generator_table(c: int = 8) -> FixedBaseTable:
    """The identity-keygen table: sk * G on the embedded curve."""
    return FixedBaseTable(EMBEDDED, c=c, nbits=256)
