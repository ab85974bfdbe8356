"""Demo-UI application logic: one object per browser session's state.

Maps the reference UI's handlers onto the framework:

- ``deposit``      -> ``handleDeposit`` (shielded-pool-card.tsx:267-376):
  identity keygen, note commitment, Merkle insert, pool deposit ix, inline
  RLWE encryption of the owner point, persisted DepositRecord.
- ``withdraw``     -> ``handleWithdraw`` + relayer POST
  (card.tsx:424-514, api/relay/withdraw/route.ts:88-309): witness assembly,
  proof generation, audit-then-withdraw two-tx relay.
- ``decrypt``      -> the Shamir "Decrypt" button (card.tsx:667-681,
  app/lib/shamir.ts:97-179): reconstruct sk from shares 1+2, decrypt the
  stored ciphertext, recover the depositor identity.
- ``status``       -> root-age display + relayer health
  (card.tsx:390-399, api/relay/status/route.ts:38-57).
- ``audit_logs`` / ``deposits`` -> the history tables (card.tsx:745+).

Proof generation defaults to the stub prover (instant, verifier accepts
any bytes) so the UI is responsive; ``prover="groth16"`` wires the real
committed withdraw circuit through solver + Groth16 with the setup cache.
"""

from __future__ import annotations

import json
import os
import secrets
import struct
import time

from tpu_zkpool.merkle.tree import MerkleTree
from tpu_zkpool.protocol import flows, storage as stg
from tpu_zkpool.protocol.audit_circuit import ct_commitment_of
from tpu_zkpool.protocol.errors import error_status
from tpu_zkpool.protocol.relayer import Relayer
from tpu_zkpool.protocol.state import Pool, PROOF_LEN
from tpu_zkpool.refimpl import rlwe_ref

DEFAULT_RLWE_DIR = "/root/reference/demo-frontend/public/rlwe"


class DemoApp:
    def __init__(self, store_path: str = "/tmp/tpu_zkpool_webui_store.json",
                 rlwe_dir: str = DEFAULT_RLWE_DIR, prover: str = "stub",
                 fresh: bool = False):
        if fresh and os.path.exists(store_path):
            os.remove(store_path)
        self.store = stg.Store(store_path)
        self.rlwe_dir = rlwe_dir
        self.prover = prover
        self.tree = MerkleTree()
        self._enc_cache: dict[str, dict] = {}
        self._g16 = None
        # rebuild the tree from persisted leaves (storage.ts:189-206)
        st = self.store.merkle_state()
        if st:
            for leaf in st.leaves:
                self.tree.insert(int(leaf, 16))
        if prover == "groth16":
            verifier = self._groth16_verifier
        else:
            verifier = lambda proof, witness: True
        self.pool = Pool(withdraw_verifier=verifier,
                         audit_verifier=lambda p, w: True)
        self.pool.initialize()
        if st:
            self.pool.state.add_root(self.tree.get_root())
        self.relayer = Relayer(self.pool)

    # ------------------------------------------------------------- proving

    def _groth16_ctx(self):
        if self._g16 is None:
            from tpu_zkpool.groth16.acir import load_artifact
            from tpu_zkpool.groth16 import solver_native as solver
            from tpu_zkpool.groth16 import r1cs as r1cs_mod
            from tpu_zkpool.groth16.cache import cached_setup
            _, prog = load_artifact(
                "/root/reference/noir_circuit/target/shielded_pool_verifier.json")
            ar = r1cs_mod.convert(prog)
            pk, vk = cached_setup(ar.r1cs)
            self._g16 = (prog, solver, r1cs_mod, ar, pk, vk)
        return self._g16

    def _groth16_verifier(self, proof_bytes: bytes, witness_bytes: bytes):
        from tpu_zkpool.groth16.gnark_fmt import parse_proof
        from tpu_zkpool.refimpl import groth16_ref as g16
        *_, vk = self._groth16_ctx()
        try:
            # malformed bytes (off-curve points, bad layout) are a
            # verification failure, not a server crash — the reference's
            # verifier CPI likewise just fails the instruction
            # (withdraw.rs:163-175)
            pf = parse_proof(proof_bytes)
        except Exception:
            return False
        n_pub = struct.unpack(">I", witness_bytes[:4])[0]
        vals = [int.from_bytes(witness_bytes[12 + 32 * i: 44 + 32 * i], "big")
                for i in range(n_pub)]
        return g16.verify(vk, (pf.ar, pf.bs, pf.krs), vals)

    def _prove_withdraw(self, wit: flows.WithdrawWitness) -> bytes:
        if self.prover != "groth16":
            return b"\x01" * PROOF_LEN
        from tpu_zkpool.groth16.gnark_fmt import emit_proof
        from tpu_zkpool.refimpl import groth16_ref as g16
        prog, solver, r1cs_mod, ar, pk, _ = self._groth16_ctx()
        w_acir = solver.solve(prog, wit.acir_inputs())
        w = r1cs_mod.build_witness(ar, w_acir)
        proof = g16.prove(pk, ar.r1cs, w)
        return emit_proof(proof[0], proof[1], proof[2], [(1, 2)], (1, 2))

    # ----------------------------------------------------------- endpoints

    def status(self) -> dict:
        root = self.tree.get_root()
        return {
            "pool_root": hex(root),
            "root_age": self.pool.state.root_age(root),
            "leaves": len(self.tree.leaves),
            "vault_lamports": self.pool.vault_lamports,
            "relayer": self.relayer.status(),
            "prover": self.prover,
        }

    def deposit(self, amount: int) -> dict:
        t0 = time.time()
        ident = flows.Identity.generate()
        note = flows.Note(ident, amount=int(amount),
                          randomness=secrets.randbits(200))
        idx = self.tree.insert(note.commitment)
        self.pool.deposit(payer_balance=int(amount) + 10_000_000,
                          amount=note.amount, commitment=note.commitment,
                          new_root=self.tree.get_root())
        pk = json.load(open(os.path.join(self.rlwe_dir, "rlwe_pk.json")))
        enc = rlwe_ref.encrypt([int(v, 16) for v in pk["a"]],
                               [int(v, 16) for v in pk["b"]],
                               ident.owner_x, ident.owner_y,
                               seed=secrets.randbits(30))
        ct = ct_commitment_of(enc)
        rec = stg.deposit_record_from_flow(note, self.tree, idx, enc, ct)
        self.store.save_deposit(rec)
        self.store.save_merkle_state([hex(v) for v in self.tree.leaves],
                                     hex(self.tree.get_root()))
        self._enc_cache[rec.id] = enc
        return {"commitment": rec.commitment, "leaf_index": idx,
                "root": rec.root, "wa_commitment": rec.wa_commitment,
                "ct_commitment": rec.ct_commitment,
                "elapsed_s": round(time.time() - t0, 3)}

    def _record(self, commitment: str) -> stg.DepositRecord:
        return self.store.get_deposit(commitment)

    def withdraw(self, commitment: str, recipient_hex: str) -> dict:
        t0 = time.time()
        rec = self._record(commitment)
        note = flows.Note(
            flows.Identity(int(rec.secret_key, 16), int(rec.public_key_x, 16),
                           int(rec.public_key_y, 16)),
            amount=int(rec.amount), randomness=int(rec.randomness, 16))
        recipient = bytes.fromhex(recipient_hex.removeprefix("0x"))
        if len(recipient) != 32:
            recipient = recipient.ljust(32, b"\x00")
        wit = flows.build_withdraw_witness(
            self.tree, note, rec.leaf_index, recipient_pubkey=recipient,
            amount=note.amount)
        proof = self._prove_withdraw(wit)
        audit_blob = flows.audit_witness_blob(
            int(rec.wa_commitment, 16), int(rec.ct_commitment or "0x0", 16))
        res = self.relayer.relay_withdraw(
            proof, wit.witness_blob(), b"\x02" * PROOF_LEN, audit_blob)
        self.store.mark_withdrawn(rec.id, "relayed")
        self.store.log_audit(hex(wit.nullifier), rec.wa_commitment,
                             rec.ct_commitment or "0x0", "relayed")
        return {"recipient": res.recipient.hex(), "amount": res.amount,
                "audit_was_new": res.audit_was_new,
                "nullifier": hex(wit.nullifier),
                "elapsed_s": round(time.time() - t0, 3)}

    def decrypt(self, commitment: str) -> dict:
        rec = self._record(commitment)
        enc = self._enc_cache.get(rec.id)
        if enc is None:
            if not rec.rlwe_ciphertext:
                raise ValueError("no ciphertext stored for this deposit")
            enc = {"c0_sparse": [int(v, 16)
                                 for v in rec.rlwe_ciphertext["c0_sparse"]],
                   "c1": [int(v, 16) for v in rec.rlwe_ciphertext["c1"]]}
        shares = [json.load(open(os.path.join(
            self.rlwe_dir, "rlwe_sk_shares", f"share_{i}.json")))
            for i in (1, 2)]
        sk_mod_q = []
        for c1v, c2v in zip(shares[0]["coefficients"],
                            shares[1]["coefficients"]):
            v = rlwe_ref.shamir_reconstruct_field(
                [(c1v["x"], int(c1v["y"], 16)),
                 (c2v["x"], int(c2v["y"], 16))])
            sk_mod_q.append(
                rlwe_ref.centered_mod(v, rlwe_ref.BN254_P) % rlwe_ref.RLWE_Q)
        msg = rlwe_ref.decrypt(sk_mod_q, enc["c0_sparse"], enc["c1"])
        x, y = rlwe_ref.decode_bytes(msg)
        match = (hex(x) == rec.public_key_x and hex(y) == rec.public_key_y)
        return {"owner_x": hex(x), "owner_y": hex(y),
                "matches_deposit": match}

    def deposits(self) -> list:
        return [{"commitment": d.commitment, "amount": d.amount,
                 "leaf_index": d.leaf_index, "status": d.status,
                 "wa_commitment": d.wa_commitment,
                 "created_at": d.created_at}
                for d in self.store.all_deposits()]

    def audit_logs(self) -> list:
        return self.store.audit_logs()

    # ------------------------------------------------------------- routing

    def handle(self, method: str, path: str, body: dict) -> tuple[int, dict]:
        """Route an API request; returns (http_status, json_payload)."""
        try:
            if method == "GET" and path == "/api/status":
                return 200, self.status()
            if method == "GET" and path == "/api/deposits":
                return 200, {"deposits": self.deposits()}
            if method == "GET" and path == "/api/audits":
                return 200, {"audits": self.audit_logs()}
            if method == "POST" and path == "/api/deposit":
                return 200, self.deposit(int(body["amount"]))
            if method == "POST" and path == "/api/withdraw":
                return 200, self.withdraw(body["commitment"],
                                          body["recipient"])
            if method == "POST" and path == "/api/decrypt":
                return 200, self.decrypt(body["commitment"])
            return 404, {"error": f"no route {method} {path}"}
        except Exception as e:  # typed errors -> UI status + recovery hint
            st = error_status(e)
            return 400, {"error": st.message, "hint": st.hint,
                         "type": st.type}
