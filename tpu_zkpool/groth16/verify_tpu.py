"""Batched Groth16 verification on TPU.

Checks e(A,B) = e(alpha,beta) e(L_pub,gamma) e(C,delta) for a BATCH of
proofs in one device computation: the four Miller loops fold into a single
Fp12 product before one shared final exponentiation —
  e(A,B) * e(-L,gamma) * e(-C,delta) * e(-alpha,beta) == 1.

This replaces per-proof CPU verification (the reference verifies one proof
per Solana transaction, ``withdraw.rs:163-175``) with chip-wide batches —
the "batched Groth16 verify" config of BASELINE.json.
"""

from __future__ import annotations

import numpy as np

from tpu_zkpool.fields.bn254 import FR_MOD
from tpu_zkpool.refimpl import pairing_ref as pr
from tpu_zkpool.curve import pairing_jax as pj


def verify_batch(vk, proofs: list, publics: list) -> np.ndarray:
    """vk: refimpl.groth16_ref.VerifyingKey (or GnarkVK-compatible fields);
    proofs: [(A, B2, C)] affine tuples; publics: [[ints]].

    Returns bool[n] of per-proof validity. L_pub accumulation runs on the
    host (small MSM over gamma_abc); the pairing product runs batched on
    device.
    """
    n = len(proofs)
    Ls = []
    for pub in publics:
        acc = vk.gamma_abc[0]
        for x, pnt in zip(pub, vk.gamma_abc[1:]):
            if x % FR_MOD:
                acc = pr.g1_add(acc, pr.g1_mul(x % FR_MOD, pnt))
        Ls.append(acc)

    def g1neg(p):
        return (p[0], (-p[1]) % pr.P)

    a_pts = [p[0] for p in proofs]
    c_pts = [g1neg(p[2]) for p in proofs]
    l_pts = [g1neg(L) for L in Ls]
    alpha_neg = [g1neg(vk.alpha1)] * n
    b_q = [p[1] for p in proofs]
    gamma_q = [vk.gamma2] * n
    delta_q = [vk.delta2] * n
    beta_q = [vk.beta2] * n

    g1_lists = [pj.g1_to_limbs(pts) for pts in (a_pts, l_pts, c_pts, alpha_neg)]
    g2_lists = [pj.g2_to_limbs(qs) for qs in (b_q, gamma_q, delta_q, beta_q)]
    ok = pj.pairing_product_is_one(g1_lists, g2_lists)
    return np.asarray(ok)
