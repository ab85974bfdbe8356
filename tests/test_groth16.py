"""Groth16 pipeline: tiny-circuit E2E, gnark formats, ACIR->R1CS conversion."""

import pytest

from tpu_zkpool.fields.bn254 import FR_MOD as R
from tpu_zkpool.refimpl.groth16_ref import R1CS, setup, prove, verify, fr_fft, fr_ifft
from tpu_zkpool.groth16.acir import load_artifact
from tpu_zkpool.groth16 import r1cs as r1cs_mod, solver
from tpu_zkpool.groth16.gnark_fmt import parse_vk, parse_proof, emit_proof

import vectors


@pytest.fixture(scope="module")
def tiny():
    # x^3 + x + 5 == out; vars [1, out, x, x^2, x^3]
    r1cs = R1CS(
        num_vars=5, num_public=2,
        a_rows=[{2: 1}, {3: 1}, {}],
        b_rows=[{2: 1}, {2: 1}, {0: 1}],
        c_rows=[{3: 1}, {4: 1}, {1: 1, 4: -1 % R, 2: -1 % R, 0: -5 % R}],
    )
    x = 3
    w = [1, x**3 + x + 5, x, x * x, x**3]
    return r1cs, w


def test_fft_roundtrip():
    import random
    rng = random.Random(4)
    coeffs = [rng.randrange(R) for _ in range(64)]
    assert fr_ifft(fr_fft(coeffs)) == coeffs


def test_groth16_tiny_end_to_end(tiny):
    r1cs, w = tiny
    assert r1cs.is_satisfied(w)
    pk, vk = setup(r1cs)
    proof = prove(pk, r1cs, w)
    assert verify(vk, proof, [w[1]])
    assert not verify(vk, proof, [w[1] + 1])


def test_acir_to_r1cs_satisfied():
    abi, prog = load_artifact(vectors.WITHDRAW_ARTIFACT)
    ar = r1cs_mod.convert(prog)
    assert len(ar.r1cs.a_rows) > 7000
    w_acir = solver.solve(prog, vectors.withdraw_inputs())
    w = r1cs_mod.build_witness(ar, w_acir)
    assert ar.r1cs.is_satisfied(w)
    # tampered witness fails
    w[100] = (w[100] + 1) % R
    assert not ar.r1cs.is_satisfied(w)


def test_forged_owner_point_rejected():
    """Soundness of the sk*G gadget (gadgets.py): replacing the MSM blackbox
    output with a forged point — and recomputing every downstream witness
    honestly — must leave the system unsatisfiable (the reference constrains
    this via fixed_base_scalar_mul, noir_circuit/src/main.nr:55-63)."""
    abi, prog = load_artifact(vectors.WITHDRAW_ARTIFACT)
    ar = r1cs_mod.convert(prog)
    w_acir = solver.solve(prog, vectors.withdraw_inputs())
    circ = prog.circuits[0]
    msm = next(op for op in circ.opcodes if op.kind == "multi_scalar_mul")
    ox, oy, _ = msm.data["out"]
    # forge: a different valid curve point (2 * real owner point)
    from tpu_zkpool.groth16.gadgets import _aff_dbl
    fx, fy = _aff_dbl((w_acir[ox], w_acir[oy]))
    forged = dict(w_acir)
    forged[ox], forged[oy] = fx, fy
    w = r1cs_mod.build_witness(ar, forged)
    assert not ar.r1cs.is_satisfied(w)


def test_parse_committed_vks():
    for path, nk in [
        ("/root/reference/noir_circuit/target/shielded_pool_verifier.vk", 7),
        ("/root/reference/audit_circuit/target/rlwe_audit.vk", 4),
        ("/root/reference/audit_circuit/target/audit_circuit.vk", 4),
    ]:
        vk = parse_vk(open(path, "rb").read())
        assert len(vk.gamma_abc) == nk
        assert len(vk.commitment_keys) == 1


def test_proof_emit_parse_roundtrip():
    from tpu_zkpool.refimpl import pairing_ref as pr
    from tpu_zkpool.fields.bn254 import G1_GX, G1_GY
    ar = pr.g1_mul(12, (G1_GX, G1_GY))
    krs = pr.g1_mul(34, (G1_GX, G1_GY))
    bs = pr.g2_mul(56, pr.G2_GEN)
    cm = pr.g1_mul(78, (G1_GX, G1_GY))
    pok = pr.g1_mul(90, (G1_GX, G1_GY))
    raw = emit_proof(ar, bs, krs, [cm], pok)
    assert len(raw) == 388  # matches withdraw.rs:13
    pf = parse_proof(raw)
    assert pf.ar == ar and pf.krs == krs and pf.bs == bs
    assert pf.commitments == [cm] and pf.pok == pok


def test_groth16_commitment_roundtrip():
    """gnark-style Pedersen commitment extension (VERDICT item 3): a
    committed wire binds via the gamma leg + verifier-derived hash input;
    tampered PoK / commitment / missing commitment all reject."""
    from tpu_zkpool.refimpl import pedersen
    from tpu_zkpool.refimpl import pairing_ref as pr
    from tpu_zkpool.refimpl.groth16_ref import G1_GEN

    # circuit: out = x^3 + x + 5 and u = t * x, with t the commitment-hash
    # public input (last public). vars [1, out, t, x, x2, x3, u].
    r1cs = R1CS(
        num_vars=7, num_public=3,
        a_rows=[{3: 1}, {4: 1}, {}, {2: 1}],
        b_rows=[{3: 1}, {3: 1}, {0: 1}, {3: 1}],
        c_rows=[{4: 1}, {5: 1}, {1: 1, 5: -1 % R, 3: -1 % R, 0: -5 % R},
                {6: 1}],
    )
    pk, vk = setup(r1cs, committed=(3,))
    assert vk.commitment_key is not None
    x = 3
    cm, pok = pedersen.commit(list(pk.basis), list(pk.basis_exp_sigma), [x])
    t = pedersen.commitment_to_field(cm)
    w = [1, x**3 + x + 5, t, x, x * x, x**3, t * x % R]
    assert r1cs.is_satisfied(w)
    proof = prove(pk, r1cs, w)
    assert len(proof) == 5
    assert proof[3] == cm and proof[4] == pok
    assert verify(vk, proof, [w[1]])
    A, B2, C, cm2, pok2 = proof
    assert not verify(vk, (A, B2, C, cm2, pr.g1_add(pok2, G1_GEN)), [w[1]])
    assert not verify(vk, (A, B2, C, pr.g1_add(cm2, G1_GEN), pok2), [w[1]])
    assert not verify(vk, (A, B2, C), [w[1]])  # commitment required

    # 388-byte wire-format e2e (withdraw.rs:13 layout): emit -> parse ->
    # verify the parsed points — the full byte path a relayer would ship.
    raw = emit_proof(A, B2, C, [cm2], pok2)
    assert len(raw) == 388
    pf = parse_proof(raw)
    assert verify(vk, (pf.ar, pf.bs, pf.krs, pf.commitments[0], pf.pok),
                  [w[1]])

    # DST pin is load-bearing (VERDICT round-2 item 4): re-deriving the
    # commitment hash under ANY other domain tag must reject the proof.
    orig = pedersen.commitment_to_field
    try:
        pedersen.commitment_to_field = lambda cm: pedersen.hash_to_field(
            pedersen.g1_marshal(cm), b"not-the-gnark-dst")
        assert not verify(vk, proof, [w[1]])
    finally:
        pedersen.commitment_to_field = orig
    assert verify(vk, proof, [w[1]])


def test_cached_setup_roundtrip(tmp_path, tiny):
    """pk/vk cache keyed by circuit hash (reference prove_linux.sh:66-79
    skip-if-exists semantics): second call loads identical keys; a changed
    circuit gets a different key."""
    from tpu_zkpool.groth16.cache import cached_setup, circuit_hash
    r1cs, w = tiny
    pk1, vk1 = cached_setup(r1cs, cache_dir=str(tmp_path))
    pk2, vk2 = cached_setup(r1cs, cache_dir=str(tmp_path))
    assert vk1.gamma_abc == vk2.gamma_abc and pk1.h_query == pk2.h_query
    proof = prove(pk2, r1cs, w)
    assert verify(vk2, proof, [w[1]])
    import dataclasses
    r2 = dataclasses.replace(r1cs, a_rows=[dict(r1cs.a_rows[0])]
                             + r1cs.a_rows[1:])
    r2.a_rows[0][2] = 2
    assert circuit_hash(r2) != circuit_hash(r1cs)
