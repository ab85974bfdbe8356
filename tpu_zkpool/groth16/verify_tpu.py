"""Batched Groth16 verification on TPU.

Checks e(A,B) = e(alpha,beta) e(L_pub,gamma) e(C,delta) for a BATCH of
proofs in one device computation, restructured around PRECOMPUTED Miller
lines (curve/lines.py):

- the fixed VK legs (gamma, delta, and the commitment key's G/GSigmaNeg)
  walk the 6x+2 schedule once on the host per VK and become line-
  coefficient arrays — the device does no G2 arithmetic and no Fp2
  inversions for them (the per-step Fermat inverses were ~80% of the
  naive loop's op count, docs/PLAN.md round 2);
- the per-proof B legs get the same treatment per batch, with the host
  Fp2 inversions themselves batched across proofs
  (``lines.g2_line_schedules_batch``: one Fp exponentiation per schedule
  step instead of one per proof per step);
- the constant e(alpha, beta) leg is a host pairing evaluated once per
  VK and compared against after the shared final exponentiation,
  removing a whole Miller-loop leg;
- the public-input accumulation L_pub runs through the native C++
  Pippenger (``native_bridge.g1_msm``) instead of per-term Python bigint
  scalar muls.

gnark's Pedersen commitment extension (the committed verifier programs'
proof layout, ``withdraw.rs:13`` / ``gnark_fmt.py``) is handled exactly as
in ``refimpl.groth16_ref.verify``: the commitment folds into the gamma leg
with its hash-to-field as the derived final public input, and the
proof-of-knowledge check e(Cm, GSigmaNeg) * e(pok, G) == 1 runs as a
second batched lines pairing on device.

This replaces per-proof CPU verification (the reference verifies one proof
per Solana transaction, ``withdraw.rs:163-175``) with chip-wide batches —
the "batched Groth16 verify" config of BASELINE.json.
"""

from __future__ import annotations

import numpy as np

from tpu_zkpool.fields.bn254 import FR_MOD
from tpu_zkpool.refimpl import pairing_ref as pr
from tpu_zkpool.refimpl import pedersen
from tpu_zkpool.curve import lines
from tpu_zkpool.curve import pairing_jax as pj
from tpu_zkpool import native_bridge


def _g1neg(p):
    return (p[0], (-p[1]) % pr.P)


# Per-VK host precompute: fixed-leg line arrays, the e(alpha, beta)
# target, and the commitment key's PoK-leg lines. Keyed by id(vk) with
# the vk object held in the value so the id stays valid.
_VK_CACHE: dict = {}


def _vk_fixed(vk):
    key = id(vk)
    hit = _VK_CACHE.get(key)
    if hit is not None and hit[0] is vk:
        return hit[1]
    gamma_l = lines.precompute_g2_lines(vk.gamma2)
    delta_l = lines.precompute_g2_lines(vk.delta2)
    target = pr.pairing(vk.alpha1, vk.beta2)
    pok_legs = None
    ck = getattr(vk, "commitment_key", None)
    if ck is not None:
        g, gsn = ck
        pok_legs = (lines.precompute_g2_lines(gsn),
                    lines.precompute_g2_lines(g))
    entry = (gamma_l, delta_l, target, pok_legs)
    _VK_CACHE[key] = (vk, entry)
    return entry


def _l_pub(vk, proof, pub):
    """Public-input accumulator for one proof via the native Pippenger."""
    pub = list(pub)
    cm = proof[3] if len(proof) == 5 else None
    if cm is not None:
        pub.append(pedersen.commitment_to_field(cm))
    ks, pts = [1], [vk.gamma_abc[0]]
    for x, pnt in zip(pub, vk.gamma_abc[1:]):
        if x % FR_MOD:
            ks.append(x % FR_MOD)
            pts.append(pnt)
    if cm is not None:
        ks.append(1)
        pts.append(cm)
    if len(ks) == 1:
        return vk.gamma_abc[0]
    return native_bridge.g1_msm(ks, pts)


def verify_batch(vk, proofs: list, publics: list) -> np.ndarray:
    """vk: refimpl.groth16_ref.VerifyingKey (or GnarkVK-compatible fields);
    proofs: [(A, B2, C)] or [(A, B2, C, Commitment, Pok)] affine tuples;
    publics: [[ints]] WITHOUT the derived commitment-hash input.

    Returns bool[n] of per-proof validity.
    """
    n = len(proofs)
    has_cm = any(len(p) == 5 for p in proofs)
    gamma_l, delta_l, target, pok_legs = _vk_fixed(vk)

    Ls = [_l_pub(vk, proof, pub) for proof, pub in zip(proofs, publics)]

    a_pts = pj.g1_to_limbs([p[0] for p in proofs])
    l_neg = pj.g1_to_limbs([_g1neg(L) for L in Ls])
    c_neg = pj.g1_to_limbs([_g1neg(p[2]) for p in proofs])
    b_lines = lines.precompute_g2_lines_batch([p[1] for p in proofs])

    # e(A,B) * e(-L, gamma) * e(-C, delta) == e(alpha, beta)
    ok = np.asarray(pj.pairing_lines_equal(
        (a_pts, l_neg, c_neg), (b_lines, gamma_l, delta_l), target))

    if has_cm:
        assert pok_legs is not None, "VK lacks a commitment key"
        # the batched Miller loop has no point-at-infinity lanes: a batch
        # must be uniformly committed or uniformly not
        assert all(len(p) == 5 and p[3] is not None and p[4] is not None
                   for p in proofs), "mixed commitment batch"
        cms = pj.g1_to_limbs([p[3] for p in proofs])
        poks = pj.g1_to_limbs([p[4] for p in proofs])
        # per-proof PoK: e(Cm, GSigmaNeg) * e(Pok, G) == 1
        ok_pok = np.asarray(pj.pairing_lines_equal(
            (cms, poks), pok_legs, None))
        ok = ok & ok_pok
    return ok
