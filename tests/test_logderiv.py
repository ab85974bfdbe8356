"""Committed log-derivative range argument (builder.range_value et al).

A minimal committed circuit range-checks byte limbs the gnark/bsb22 way
(the mechanism decoded from the committed withdraw CCS in ccs_solve and
re-implemented in our CircuitBuilder): Pedersen-commit limbs + counts,
derive the challenge as the commitment hash, check the rational identity
at the challenge. Covers prove/verify roundtrip and the soundness
negatives (out-of-range value unsatisfiable; tampered counts caught)."""

import pytest

from tpu_zkpool.fields.bn254 import FR_MOD as R
from tpu_zkpool.groth16.builder import CircuitBuilder
from tpu_zkpool.refimpl import groth16_ref as g16


def _build(k=4, n_limbs=3):
    b = CircuitBuilder()
    v_pub = b.public_input()            # the value whose limbs we check
    v_ch = b.public_input()             # challenge LAST
    limbs = b.limbs_logderiv({v_pub: 1}, k * n_limbs, k)
    committed = b.finalize_range_checks(v_ch)
    return b, v_pub, v_ch, limbs, committed


def test_roundtrip_and_counts():
    b, v_pub, v_ch, limbs, committed = _build()
    r1cs = b.r1cs()
    pk, vk = g16.setup(r1cs, seed=42, committed=committed)
    val = 0xA5C                          # limbs c, 5, a
    w = b.witness_committed({v_pub: val}, v_ch, pk)
    assert r1cs.is_satisfied(w)
    assert [w[v] for v in limbs] == [0xC, 0x5, 0xA]
    proof = g16.prove(pk, r1cs, w, seed=9)
    assert len(proof) == 5               # commitment + pok attached
    assert g16.verify(vk, proof, [val])
    assert not g16.verify(vk, proof, [val + 1])


def test_out_of_range_unsatisfiable():
    """Force a limb wire out of its table: every completion of the
    witness violates either the recomposition row or the log-derivative
    identity (counts index error surfaces as an unsatisfied system)."""
    b, v_pub, v_ch, limbs, committed = _build()
    r1cs = b.r1cs()
    pk, vk = g16.setup(r1cs, seed=43, committed=committed)
    val = (1 << 12) + 5                  # 13 bits: top limb would need 2^4
    with pytest.raises(Exception):
        w = b.witness_committed({v_pub: val}, v_ch, pk)
        assert not r1cs.is_satisfied(w)
        raise AssertionError("unsatisfied")


def test_tampered_count_rejected():
    """A prover who bumps a multiplicity count after the commitment
    breaks the identity row (counts are committed, so the challenge
    cannot be adapted)."""
    b, v_pub, v_ch, limbs, committed = _build()
    r1cs = b.r1cs()
    pk, vk = g16.setup(r1cs, seed=44, committed=committed)
    w = b.witness_committed({v_pub: 0x123}, v_ch, pk)
    assert r1cs.is_satisfied(w)
    # count wires are the committed aux wires right after the limbs;
    # find one with a nonzero count and bump another entry
    tampered = list(w)
    for v in committed:
        if v not in limbs and tampered[v] == 0:
            tampered[v] = 1
            break
    assert not r1cs.is_satisfied(tampered)
