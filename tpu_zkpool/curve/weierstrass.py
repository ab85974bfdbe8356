"""Batched Jacobian point arithmetic for a = 0 short-Weierstrass curves.

Points are (X, Y, Z) limb triples, uint32[..., 16] each, Montgomery domain,
with Z = 0 encoding the identity. Complete addition is built from the
standard Jacobian formulas plus lane-wise selects for the special cases, so
one call processes an arbitrary batch — the building block for batched
identity keygen (replacing noble-curves at ``client/merkle.ts:104``) and for
Pippenger MSM bucket accumulation (SURVEY.md §7.1 L3).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.fctx import FieldCtx, FR, FP, FP_U
from tpu_zkpool.fields import bn254
from tpu_zkpool.fields.limbs import NLIMB


@dataclass(frozen=True, eq=False)
class CurveOps:
    """Batched ops on y^2 = x^3 + b over field F (a = 0)."""

    F: FieldCtx
    b: int
    gen: tuple  # (gx, gy) Python ints
    order: int

    # ------------------------------------------------------------- helpers

    def identity(self, shape=()):
        z = self.F.zeros(shape)
        return z, z, z

    def from_affine_ints(self, xs, ys):
        """Host: int arrays -> device Jacobian (Z=1) Montgomery limbs."""
        X = jnp.asarray(self.F.to_mont(np.asarray(xs, dtype=object)))
        Y = jnp.asarray(self.F.to_mont(np.asarray(ys, dtype=object)))
        Z = self.F.ones_mont(X.shape[:-1])
        return X, Y, Z

    def to_affine_ints(self, P):
        """Device Jacobian -> host object arrays (x, y) with None-for-inf
        encoded as (0, 0)."""
        X, Y, Z = P
        zinv = self.F.inv(jnp.where(self.F.is_zero(Z)[..., None],
                                    self.F.ones_mont(Z.shape[:-1]), Z))
        zinv2 = self.F.mont_mul(zinv, zinv)
        x = self.F.mont_mul(X, zinv2)
        y = self.F.mont_mul(Y, self.F.mont_mul(zinv2, zinv))
        inf = self.F.is_zero(Z)
        x = jnp.where(inf[..., None], jnp.zeros_like(x), x)
        y = jnp.where(inf[..., None], jnp.zeros_like(y), y)
        return self.F.from_mont(np.asarray(x)), self.F.from_mont(np.asarray(y))

    # ----------------------------------------------------------- arithmetic

    def double(self, P):
        """2P, Jacobian a=0: handles Z=0 and Y=0 via the formulas (Z3=2YZ=0)."""
        F = self.F
        X, Y, Z = P
        A = F.mont_mul(X, X)
        B = F.mont_mul(Y, Y)
        C = F.mont_mul(B, B)
        xb = F.add(X, B)
        D = F.sub(F.sub(F.mont_mul(xb, xb), A), C)
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        Fq = F.mont_mul(E, E)
        X3 = F.sub(Fq, F.add(D, D))
        C8 = F.add(C, C); C8 = F.add(C8, C8); C8 = F.add(C8, C8)
        Y3 = F.sub(F.mont_mul(E, F.sub(D, X3)), C8)
        YZ = F.mont_mul(Y, Z)
        Z3 = F.add(YZ, YZ)
        return X3, Y3, Z3

    def add(self, P, Q):
        """P + Q, complete (select-based) Jacobian addition."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = F.mont_mul(Z1, Z1)
        Z2Z2 = F.mont_mul(Z2, Z2)
        U1 = F.mont_mul(X1, Z2Z2)
        U2 = F.mont_mul(X2, Z1Z1)
        S1 = F.mont_mul(Y1, F.mont_mul(Z2, Z2Z2))
        S2 = F.mont_mul(Y2, F.mont_mul(Z1, Z1Z1))
        H = F.sub(U2, U1)
        r = F.sub(S2, S1)
        HH = F.mont_mul(H, H)
        HHH = F.mont_mul(H, HH)
        V = F.mont_mul(U1, HH)
        r2 = F.mont_mul(r, r)
        X3 = F.sub(F.sub(r2, HHH), F.add(V, V))
        Y3 = F.sub(F.mont_mul(r, F.sub(V, X3)), F.mont_mul(S1, HHH))
        Z3 = F.mont_mul(F.mont_mul(Z1, Z2), H)

        # special cases
        p_inf = F.is_zero(Z1)
        q_inf = F.is_zero(Z2)
        same_x = F.is_zero(H)
        same_y = F.is_zero(r)
        dbl = self.double(P)
        is_dbl = same_x & same_y & ~p_inf & ~q_inf
        to_inf = same_x & ~same_y & ~p_inf & ~q_inf

        def sel(cond, a, b):
            return jnp.where(cond[..., None], a, b)

        out = []
        for i in range(3):
            v = (X3, Y3, Z3)[i]
            v = sel(is_dbl, dbl[i], v)
            v = sel(to_inf, jnp.zeros_like(v), v)
            v = sel(p_inf, Q[i], v)
            v = sel(q_inf, P[i], v)
            out.append(v)
        return tuple(out)

    def scalar_mul(self, bits, P):
        """[k]P with k given as uint32[..., NBITS] bits, MSB first.

        Double-and-add under lax.scan; fully batched (per-lane scalars and
        points).
        """
        F = self.F

        def body(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, P)
            acc = tuple(
                jnp.where((bit == 1)[..., None], a, b) for a, b in zip(added, acc)
            )
            return acc, None

        bitsT = jnp.moveaxis(bits, -1, 0)
        acc, _ = jax.lax.scan(body, self.identity(bits.shape[:-1]), bitsT)
        return acc

    @staticmethod
    def bits_from_ints(ks, nbits: int) -> np.ndarray:
        """Host: int scalars -> uint32[..., nbits] MSB-first bit arrays."""
        ks = np.asarray(ks, dtype=object)
        flat = ks.reshape(-1)
        out = np.zeros((flat.shape[0], nbits), dtype=np.uint32)
        for i, k in enumerate(flat):
            k = int(k)
            for j in range(nbits):
                out[i, nbits - 1 - j] = (k >> j) & 1
        return out.reshape(ks.shape + (nbits,))


EMBEDDED = CurveOps(
    F=FR,
    b=bn254.EMBEDDED_B,
    gen=(bn254.EMBEDDED_GX, bn254.EMBEDDED_GY),
    order=bn254.EMBEDDED_ORDER,
)

G1 = CurveOps(F=FP, b=3, gen=(bn254.G1_GX, bn254.G1_GY), order=bn254.FR_MOD)

# Unrolled-field variant: identical math with fused (scan-free) limb ops —
# use on small-batch serial paths (MSM bucket reduction, Horner) where
# per-scan-step launch overhead dominates.
G1_UNROLLED = CurveOps(F=FP_U, b=3, gen=(bn254.G1_GX, bn254.G1_GY),
                       order=bn254.FR_MOD)
