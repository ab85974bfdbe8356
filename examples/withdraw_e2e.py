#!/usr/bin/env python3
"""End-to-end withdraw proof: committed ACIR -> R1CS -> Groth16 -> pool.

The full replacement for the reference pipeline
`nargo execute && sunspot compile/setup/prove/verify` + on-chain withdraw
(``noir_circuit/prove_linux.sh``, ``client/test-shielded-pool.ts``):

1. parse the committed withdraw circuit artifact,
2. solve the witness for the committed prover-params.toml vector,
3. convert to R1CS, run our Groth16 setup/prove/verify (native-accelerated),
4. wire-serialize the proof (gnark 388-byte layout) and drive it through the
   pool state machine + relayer, including the negative cases.
"""

import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

DEVICE = "--device" in sys.argv
if not DEVICE:
    # host/CPU development run; --device proves on the real TPU through
    # the grid-MSM prover (prove_tpu), matching prove_linux.sh:80-84.
    jax.config.update("jax_platforms", "cpu")
else:
    from tpu_zkpool.utils import enable_compile_cache
    enable_compile_cache()

from tpu_zkpool.groth16.acir import load_artifact
from tpu_zkpool.groth16 import solver_native as solver
from tpu_zkpool.groth16 import r1cs as r1cs_mod
from tpu_zkpool.groth16.gnark_fmt import emit_proof, parse_proof
from tpu_zkpool.refimpl import groth16_ref as g16
from tpu_zkpool.protocol.state import Pool, PoolError, PROOF_LEN
from tpu_zkpool.protocol import flows

import vectors


def main():
    print("=== 1. parse + solve committed withdraw circuit ===")
    abi, prog = load_artifact(vectors.WITHDRAW_ARTIFACT)
    ar = r1cs_mod.convert(prog)
    w_acir = solver.solve(prog, vectors.withdraw_inputs())
    w = r1cs_mod.build_witness(ar, w_acir)
    assert ar.r1cs.is_satisfied(w)
    print(f"{len(ar.r1cs.a_rows)} constraints satisfied")

    print("=== 2. Groth16 setup / prove / verify ===")
    from tpu_zkpool.groth16.cache import cached_setup
    t0 = time.time(); pk, vk = cached_setup(ar.r1cs, verbose=True)
    print(f"setup: {time.time()-t0:.0f}s")
    if DEVICE:
        from tpu_zkpool.groth16 import prove_tpu
        print(f"devices: {jax.devices()}")
        t0 = time.time()
        dpk = prove_tpu.DeviceProvingKey(pk, backend="pallas")
        print(f"device pk upload: {time.time()-t0:.0f}s")
        t0 = time.time(); proof = prove_tpu.prove(dpk, ar.r1cs, w)
        print(f"prove (TPU grid MSMs + NTT): {time.time()-t0:.1f}s")
        t0 = time.time(); proof2 = prove_tpu.prove(dpk, ar.r1cs, w, seed=11)
        print(f"prove warm: {time.time()-t0:.1f}s")
    else:
        t0 = time.time(); proof = g16.prove(pk, ar.r1cs, w)
        print(f"prove: {time.time()-t0:.0f}s")
    pub = w[1:ar.r1cs.num_public]
    assert g16.verify(vk, proof, pub)
    assert not g16.verify(vk, proof, [pub[0] + 1] + pub[1:])
    if DEVICE:
        assert g16.verify(vk, proof2, pub), "warm device proof invalid"
    print("verify ok (+ negative)")

    print("=== 3. wire format + pool flow ===")
    wire = emit_proof(proof[0], proof[1], proof[2], [(1, 2)], (1, 2))
    assert len(wire) == PROOF_LEN

    def verifier(proof_bytes, witness_bytes):
        pf = parse_proof(proof_bytes)
        n_pub = struct.unpack(">I", witness_bytes[:4])[0]
        vals = [int.from_bytes(witness_bytes[12 + 32 * i: 44 + 32 * i], "big")
                for i in range(n_pub)]
        return g16.verify(vk, (pf.ar, pf.bs, pf.krs), vals)

    pool = Pool(withdraw_verifier=verifier, audit_verifier=lambda p, wt: True)
    pool.initialize()
    pool.vault_lamports += 2 * vectors.AMOUNT
    pool.state.add_root(vectors.ROOT)
    pool.submit_audit(b"\x01" * PROOF_LEN,
                      flows.audit_witness_blob(vectors.WA_COMMITMENT, 0))
    wit = flows.WithdrawWitness(
        root=vectors.ROOT, nullifier=vectors.NULLIFIER,
        recipient_field=vectors.RECIPIENT, amount=vectors.AMOUNT,
        wa_commitment=vectors.WA_COMMITMENT, secret_key=0, owner_x=0,
        owner_y=0, randomness=0, index=0, siblings=[0] * 16)
    rec, amt = pool.withdraw(wire, wit.witness_blob())
    print(f"withdraw ok: {amt} lamports -> {rec.hex()[:16]}...")
    try:
        pool.withdraw(wire, wit.witness_blob())
        raise AssertionError("double spend accepted")
    except PoolError:
        print("double spend rejected")
    print("E2E OK")


if __name__ == "__main__":
    main()
