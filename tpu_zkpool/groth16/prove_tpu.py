"""Groth16 proving with the MSMs and H(X) on TPU.

The device-side counterpart of ``refimpl.groth16_ref.prove``: witness-scalar
MSMs over the proving-key G1 queries run through the Pippenger kernels
(``msm.pippenger``), and H(X) = (UV - W)/t runs through the Fr-domain NTT
(``groth16.domain``). The G2 leg (B) stays on the native C++ path — the
per-proof G2 work is small and host-cheap.

The constraint matvecs (U/V/W evaluations) are sparse host work for now;
they become device CSR matmuls when proving throughput moves beyond
single proofs.
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.bn254 import FR_MOD as R
from tpu_zkpool.fields.fctx import FR, FP
from tpu_zkpool.curve.weierstrass import G1 as G1C
from tpu_zkpool.msm.pippenger import msm, window_digits
from tpu_zkpool.groth16 import domain
from tpu_zkpool.refimpl import groth16_ref as g16
from tpu_zkpool.refimpl import pairing_ref as pr


def _points_device(pts: list):
    """Affine int points (None allowed) -> Jacobian limb arrays, padded to a
    power of two with identities."""
    n = len(pts)
    npad = 1
    while npad < n:
        npad <<= 1
    xs = [p[0] if p else 0 for p in pts] + [0] * (npad - n)
    ys = [p[1] if p else 0 for p in pts] + [0] * (npad - n)
    X = jnp.asarray(FP.to_mont(np.asarray(xs, dtype=object)))
    Y = jnp.asarray(FP.to_mont(np.asarray(ys, dtype=object)))
    # identity encoded as Z = 0 (for padding and None points)
    zmask = np.asarray([1 if p else 0 for p in pts] + [0] * (npad - n),
                       dtype=np.uint32)
    Z = FP.ones_mont((npad,)) * jnp.asarray(zmask)[:, None]
    return (X, Y, Z), npad


class DeviceProvingKey:
    """Device-resident G1 query points + host pk for the G2/native legs."""

    def __init__(self, pk: g16.ProvingKey):
        self.pk = pk
        self.a_query, self._na = _points_device(pk.a_query)
        self.b1_query, _ = _points_device(pk.b1_query)
        self.k_query, self._nk = _points_device(pk.k_query)
        self.h_query, self._nh = _points_device(pk.h_query)

    # ---------------------------------------------------------------- MSMs

    def _msm_device(self, points_dev, npad, scalars: list):
        digs = np.zeros((npad, 32), dtype=np.uint32)
        digs[: len(scalars)] = window_digits([s % R for s in scalars])
        res = msm(G1C, points_dev, jnp.asarray(digs), 8)
        xs, ys = G1C.to_affine_ints(tuple(np.asarray(r)[None] for r in res))
        x = int(np.asarray(xs).reshape(-1)[0])
        y = int(np.asarray(ys).reshape(-1)[0])
        return None if x == 0 and y == 0 else (x, y)


def compute_h_device(r1cs, w_full: list, n: int) -> list:
    """H(X) coefficients with the NTT work on device (evals host-side)."""
    m = len(r1cs.a_rows)
    ua = [r1cs.eval_row(r1cs.a_rows[c], w_full) for c in range(m)] + [0] * (n - m)
    vb = [r1cs.eval_row(r1cs.b_rows[c], w_full) for c in range(m)] + [0] * (n - m)
    wc = [r1cs.eval_row(r1cs.c_rows[c], w_full) for c in range(m)] + [0] * (n - m)

    dev = jnp.asarray(FR.to_mont(np.asarray([ua, vb, wc], dtype=object)))

    # t(g w^i) = g^n - 1, constant on the coset.
    t_coset_inv = pow(pow(domain.COSET_G, n, R) - 1, -1, R)
    tinv_m = jnp.asarray(FR.to_mont(np.asarray([t_coset_inv], dtype=object))[0])

    @jax.jit
    def pipeline(evs):
        # Montgomery bookkeeping: evs hold x*R; NTT stages preserve that;
        # mont_mul(U*R, V*R) = U*V*R, so every intermediate stays in the
        # Montgomery domain exactly.
        coeffs = domain.interpolate_natural(evs)
        on_coset = domain.coset_forward(coeffs)
        uv = FR.mont_mul(on_coset[0], on_coset[1])
        numer = FR.sub(uv, on_coset[2])
        h_ev = FR.mont_mul(numer, tinv_m)
        return domain.coset_inverse(h_ev)

    h_m = pipeline(dev)
    return [int(v) for v in FR.from_mont(np.asarray(h_m))]


def prove(dpk: DeviceProvingKey, r1cs, w_full: list, seed: int = 7):
    """Groth16 proof with G1 MSMs + H(X) on device."""
    pk = dpk.pk
    rng = random.Random(seed)
    r_rand, s_rand = rng.randrange(R), rng.randrange(R)
    n = pk.n_domain

    A = dpk._msm_device(dpk.a_query, dpk._na, w_full)
    A = pr.g1_add(pk.alpha1, A)
    A = pr.g1_add(A, pr.g1_mul(r_rand, pk.delta1) if r_rand else None)

    B1 = dpk._msm_device(dpk.b1_query, dpk._na, w_full)
    B1 = pr.g1_add(pk.beta1, B1)
    B1 = pr.g1_add(B1, pr.g1_mul(s_rand, pk.delta1) if s_rand else None)

    B2 = g16._msm2(pk.b2_query, w_full)
    B2 = pr.g2_add(pk.beta2, B2)
    B2 = pr.g2_add(B2, pr.g2_mul(s_rand, pk.delta2) if s_rand else None)

    h = compute_h_device(r1cs, w_full, n)
    HT = dpk._msm_device(dpk.h_query, dpk._nh, h[: n - 1])
    Kpriv = dpk._msm_device(dpk.k_query, dpk._nk, w_full[r1cs.num_public:])
    C = pr.g1_add(Kpriv, HT)
    C = pr.g1_add(C, pr.g1_mul(s_rand, A) if s_rand else None)
    C = pr.g1_add(C, pr.g1_mul(r_rand, B1) if r_rand else None)
    rs = r_rand * s_rand % R
    C = pr.g1_add(C, pr.g1_mul((R - rs) % R, pk.delta1) if rs else None)
    return (A, B2, C)
