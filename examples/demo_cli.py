#!/usr/bin/env python3
"""Shielded-pool demo console — the L6 demo-UI equivalent (C26).

The terminal analogue of ``demo-frontend/app/components/
shielded-pool-card.tsx``: drives the full user journey with the same
surfaces the browser card exposes — deposit (identity keygen + RLWE
encryption inline), root-age display, audit submission, relayer
withdrawal, the audit-history table, and auditor Shamir decryption — using
the framework's storage (C23), typed errors with recovery hints (C24),
and proof-hex tooling (C20). Proof generation/verification is wired
through lightweight stub verifiers by default so the demo runs in
seconds; the real proving pipeline lives in withdraw_e2e.py / audit_e2e.py.

Usage: python examples/demo_cli.py [--store /tmp/demo-store.json]
"""

import argparse
import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

from tpu_zkpool.merkle.tree import MerkleTree
from tpu_zkpool.protocol import flows, storage as stg
from tpu_zkpool.protocol.errors import error_status, status
from tpu_zkpool.protocol.relayer import Relayer
from tpu_zkpool.protocol.state import Pool, PoolError, PROOF_LEN
from tpu_zkpool.protocol.audit_circuit import ct_commitment_of
from tpu_zkpool.refimpl import rlwe_ref
from tpu_zkpool.utils.profiling import StageTimer

import vectors


def banner(txt):
    print(f"\n{'=' * 64}\n {txt}\n{'=' * 64}", flush=True)


def show(st):
    icon = {"success": "[ok]", "error": "[err]", "loading": "[..]",
            "warning": "[!]"}.get(st.type, "[--]")
    print(f"  {icon} {st.message}" + (f"\n       hint: {st.hint}"
                                      if st.hint else ""), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/tpu_zkpool_demo_store.json")
    args = ap.parse_args()
    if os.path.exists(args.store):
        os.remove(args.store)

    timer = StageTimer("demo")
    store = stg.Store(args.store)
    tree = MerkleTree()
    pool = Pool(withdraw_verifier=lambda p, w: True,
                audit_verifier=lambda p, w: True)
    pool.initialize()
    relayer = Relayer(pool)

    banner("1. Deposit — identity keygen + note commitment + RLWE encrypt")
    with timer.stage("deposit"):
        ident = flows.Identity.generate()
        note = flows.Note(ident, amount=5_000_000,
                          randomness=secrets.randbits(200))
        idx = tree.insert(note.commitment)
        pool.deposit(payer_balance=10_000_000, amount=note.amount,
                     commitment=note.commitment, new_root=tree.get_root())

        pk = json.load(open(f"{vectors.RLWE_DIR}/rlwe_pk.json"))
        a_pk = [int(v, 16) for v in pk["a"]]
        b_pk = [int(v, 16) for v in pk["b"]]
        enc = rlwe_ref.encrypt(a_pk, b_pk, ident.owner_x, ident.owner_y,
                               seed=secrets.randbits(30))
        ct = ct_commitment_of(enc)
        rec = stg.deposit_record_from_flow(note, tree, idx, enc, ct)
        store.save_deposit(rec)
        store.save_merkle_state([hex(v) for v in tree.leaves],
                                hex(tree.get_root()))
    show(status("success", f"deposited {note.amount} lamports; "
                f"leaf {idx}, commitment {rec.commitment[:18]}..."))
    age = pool.state.root_age(tree.get_root())
    show(status("success", f"root age {age} (32-root window)"))

    banner("2. Relayed withdraw — audit tx then withdraw tx")
    with timer.stage("withdraw"):
        wit = flows.build_withdraw_witness(
            tree, note, idx, recipient_pubkey=b"\x07" * 32,
            amount=note.amount)
        audit_blob = flows.audit_witness_blob(ident.wa_commitment, ct)
        res = relayer.relay_withdraw(
            b"\x01" * PROOF_LEN, wit.witness_blob(),
            b"\x02" * PROOF_LEN, audit_blob)
        store.mark_withdrawn(rec.id, "relayed")
        store.log_audit(hex(wit.nullifier), rec.wa_commitment, hex(ct),
                        "relayed")
    show(status("success", f"withdrew {res.amount} to "
                f"{res.recipient.hex()[:16]}... "
                f"(audit {'new' if res.audit_was_new else 'existing'})"))
    show(status("success", f"relayer health: {relayer.status()}"))

    banner("3. Double-spend attempt — typed error with recovery hint")
    try:
        relayer.relay_withdraw(b"\x01" * PROOF_LEN, wit.witness_blob(),
                               b"\x02" * PROOF_LEN, audit_blob)
    except PoolError as e:
        show(error_status(e))

    banner("4. Audit history + auditor decryption (Shamir 2-of-3)")
    for row in store.audit_logs():
        print(f"  #{row['id']}  nullifier {row['nullifier'][:18]}... "
              f"wa {row['wa_commitment'][:18]}...", flush=True)
    with timer.stage("decrypt"):
        shares = [json.load(open(
            f"{vectors.RLWE_DIR}/rlwe_sk_shares/share_{i}.json"))
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
    assert (x, y) == (ident.owner_x, ident.owner_y)
    show(status("success", "auditor recovered the depositor identity "
                "exactly (owner_x/owner_y match)"))

    timer.print_summary()
    print("\nDEMO OK", flush=True)


if __name__ == "__main__":
    main()
