"""Batched Groth16 verification on TPU.

Checks e(A,B) = e(alpha,beta) e(L_pub,gamma) e(C,delta) for a BATCH of
proofs in one device computation: the four Miller loops fold into a single
Fp12 product before one shared final exponentiation —
  e(A,B) * e(-L,gamma) * e(-C,delta) * e(-alpha,beta) == 1.

gnark's Pedersen commitment extension (the committed verifier programs'
proof layout, ``withdraw.rs:13`` / ``gnark_fmt.py``) is handled exactly as
in ``refimpl.groth16_ref.verify``: the commitment folds into the gamma leg
with its hash-to-field as the derived final public input, and the
proof-of-knowledge check e(Cm, GSigmaNeg) * e(pok, G) == 1 runs as a
second batched pairing product on device.

This replaces per-proof CPU verification (the reference verifies one proof
per Solana transaction, ``withdraw.rs:163-175``) with chip-wide batches —
the "batched Groth16 verify" config of BASELINE.json.
"""

from __future__ import annotations

import numpy as np

from tpu_zkpool.fields.bn254 import FR_MOD
from tpu_zkpool.refimpl import pairing_ref as pr
from tpu_zkpool.refimpl import pedersen
from tpu_zkpool.curve import pairing_jax as pj


def _g1neg(p):
    return (p[0], (-p[1]) % pr.P)


def verify_batch(vk, proofs: list, publics: list) -> np.ndarray:
    """vk: refimpl.groth16_ref.VerifyingKey (or GnarkVK-compatible fields);
    proofs: [(A, B2, C)] or [(A, B2, C, Commitment, Pok)] affine tuples;
    publics: [[ints]] WITHOUT the derived commitment-hash input.

    Returns bool[n] of per-proof validity. L_pub accumulation runs on the
    host (small MSM over gamma_abc); the pairing products run batched on
    device.
    """
    n = len(proofs)
    has_cm = any(len(p) == 5 for p in proofs)
    key = getattr(vk, "commitment_key", None)

    Ls = []
    for proof, pub in zip(proofs, publics):
        pub = list(pub)
        cm = proof[3] if len(proof) == 5 else None
        if cm is not None:
            pub.append(pedersen.commitment_to_field(cm))
        acc = vk.gamma_abc[0]
        for x, pnt in zip(pub, vk.gamma_abc[1:]):
            if x % FR_MOD:
                acc = pr.g1_add(acc, pr.g1_mul(x % FR_MOD, pnt))
        if cm is not None:
            acc = pr.g1_add(acc, cm)
        Ls.append(acc)

    a_pts = [p[0] for p in proofs]
    c_pts = [_g1neg(p[2]) for p in proofs]
    l_pts = [_g1neg(L) for L in Ls]
    alpha_neg = [_g1neg(vk.alpha1)] * n
    b_q = [p[1] for p in proofs]
    gamma_q = [vk.gamma2] * n
    delta_q = [vk.delta2] * n
    beta_q = [vk.beta2] * n

    g1_lists = [pj.g1_to_limbs(pts) for pts in (a_pts, l_pts, c_pts, alpha_neg)]
    g2_lists = [pj.g2_to_limbs(qs) for qs in (b_q, gamma_q, delta_q, beta_q)]
    ok = np.asarray(pj.pairing_product_is_one(g1_lists, g2_lists))

    if has_cm:
        assert key is not None, "VK lacks a commitment key"
        # the batched Miller loop has no point-at-infinity lanes: a batch
        # must be uniformly committed or uniformly not
        assert all(len(p) == 5 and p[3] is not None and p[4] is not None
                   for p in proofs), "mixed commitment batch"
        g, gsn = key
        cms = [p[3] for p in proofs]
        poks = [p[4] for p in proofs]
        # per-proof PoK: e(Cm, GSigmaNeg) * e(Pok, G) == 1
        g1_lists2 = [pj.g1_to_limbs(cms), pj.g1_to_limbs(poks)]
        g2_lists2 = [pj.g2_to_limbs([gsn] * n), pj.g2_to_limbs([g] * n)]
        ok_pok = np.asarray(pj.pairing_product_is_one(g1_lists2, g2_lists2))
        ok = ok & ok_pok
    return ok
