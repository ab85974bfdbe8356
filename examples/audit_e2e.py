#!/usr/bin/env python3
"""End-to-end audit proof: RLWE encrypt -> audit R1CS -> Groth16.

The full replacement for ``scripts/generate_audit.py``'s pipeline (circuit
generation + nargo + sunspot): encrypts the identity under the committed
auditor public key, assembles quotient witnesses, builds the audit circuit
directly as R1CS, and proves/verifies with our Groth16.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

DEVICE = "--device" in sys.argv
if not DEVICE:
    jax.config.update("jax_platforms", "cpu")

from tpu_zkpool.protocol.audit_circuit import build_audit_circuit, ct_commitment_of
from tpu_zkpool.refimpl import rlwe_ref, groth16_ref as g16
from tpu_zkpool.hash.poseidon_params import poseidon_hash_ref

import vectors


def main():
    pk = json.load(open(f"{vectors.RLWE_DIR}/rlwe_pk.json"))
    a_pk = [int(v, 16) for v in pk["a"]]
    b_pk = [int(v, 16) for v in pk["b"]]

    print("=== 1. build audit circuit (R1CS) ===")
    t0 = time.time()
    circ = build_audit_circuit(a_pk, b_pk)
    r1cs = circ.builder.r1cs()
    print(f"{len(r1cs.a_rows)} constraints in {time.time()-t0:.1f}s")

    print("=== 2. encrypt + witness ===")
    enc = rlwe_ref.encrypt(a_pk, b_pk, vectors.OWNER_X, vectors.OWNER_Y, seed=999)
    wa = poseidon_hash_ref([vectors.OWNER_X, vectors.OWNER_Y])
    ct = ct_commitment_of(enc)
    w = circ.builder.witness(
        circ.assignment(vectors.OWNER_X, vectors.OWNER_Y, enc, wa, ct,
                        vectors.SECRET_KEY))
    assert r1cs.is_satisfied(w)
    print(f"wa={hex(wa)[:18]} ct={hex(ct)[:18]}; witness satisfied")

    print("=== 3. Groth16 ===")
    from tpu_zkpool.groth16.cache import cached_setup
    t0 = time.time(); pkg, vkg = cached_setup(r1cs, verbose=True); print(f"setup: {time.time()-t0:.0f}s")
    if DEVICE:
        # full audit circuit through the TPU grid pipeline: 4 G1 MSMs
        # (~2^17-padded queries) + the Fp2 G2 MSM + the H(X) NTT on chip
        from tpu_zkpool.groth16 import prove_tpu
        print(f"devices: {jax.devices()}")
        t0 = time.time()
        dpk = prove_tpu.DeviceProvingKey(pkg, backend="pallas")
        print(f"device pk upload: {time.time()-t0:.0f}s")
        t0 = time.time(); proof = prove_tpu.prove(dpk, r1cs, w)
        print(f"prove (TPU grid MSMs + NTT): {time.time()-t0:.1f}s")
        t0 = time.time(); proof2 = prove_tpu.prove(dpk, r1cs, w, seed=11)
        print(f"prove warm: {time.time()-t0:.1f}s")
        assert g16.verify(vkg, proof2, [wa, ct]), "warm device proof invalid"
    else:
        t0 = time.time(); proof = g16.prove(pkg, r1cs, w); print(f"prove: {time.time()-t0:.0f}s")
    assert g16.verify(vkg, proof, [wa, ct])
    assert not g16.verify(vkg, proof, [wa, ct + 1])
    print("verify ok (+ negative). E2E OK")


if __name__ == "__main__":
    main()
