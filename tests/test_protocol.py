"""Pool state machine + flows, incl. the reference's negative cases
(test-shielded-pool.ts:386-439: corrupted proof, wrong recipient encoding,
double spend) and the payroll multi-recipient scenario."""

import pytest

from tpu_zkpool.merkle import MerkleTree
from tpu_zkpool.protocol import state as st
from tpu_zkpool.protocol import flows
from tpu_zkpool.protocol.relayer import Relayer
from tpu_zkpool.protocol.state import Pool, PoolError


def make_pool(accept=True):
    ok = lambda proof, wit: accept and proof != b"\x00" * st.PROOF_LEN
    pool = Pool(withdraw_verifier=ok, audit_verifier=ok)
    pool.initialize()
    return pool


def make_withdraw(tree, ident, amount, recipient, idx, note):
    w = flows.build_withdraw_witness(tree, note, idx, recipient, amount)
    return w


def test_state_bytes_roundtrip():
    s = st.ShieldedPoolState()
    for r in range(1, 40):
        s.add_root(r * 1000)
    raw = s.to_bytes()
    assert len(raw) == 1072  # state.rs layout
    s2 = st.ShieldedPoolState.from_bytes(raw)
    assert s2.current_root == s.current_root
    assert s2.root_history == s.root_history
    # ring window: root 7000 was evicted (39 inserts > 32 window)
    assert not s2.check_root(7 * 1000)
    assert s2.check_root(39 * 1000)
    assert s2.root_age(39 * 1000) == 0


def test_audit_record_bytes():
    rec = st.AuditRecord(wa_commitment=0x1234)
    raw = rec.to_bytes()
    assert len(raw) == 40
    assert st.AuditRecord.from_bytes(raw).wa_commitment == 0x1234


def test_full_flow_and_negatives():
    pool = make_pool()
    tree = MerkleTree()
    ident = flows.Identity.generate(12345)
    note = flows.Note(ident, amount=1_000_000, randomness=67890)
    idx = tree.insert(note.commitment)
    payer = pool.deposit(10_000_000, note.amount, note.commitment,
                         tree.get_root())
    assert payer == 9_000_000

    recipient = bytes(range(32))
    w = make_withdraw(tree, ident, note.amount, recipient, idx, note)
    proof = b"\x01" * st.PROOF_LEN
    audit_wit = flows.audit_witness_blob(ident.wa_commitment, 999)
    pool.submit_audit(proof, audit_wit)

    rec, amt = pool.withdraw(proof, w.witness_blob())
    assert amt == note.amount
    assert rec == st.encode_recipient(recipient)

    # double spend: same nullifier
    with pytest.raises(PoolError, match="nullifier"):
        pool.withdraw(proof, w.witness_blob())

    # corrupted proof
    note2 = flows.Note(ident, amount=500_000, randomness=1)
    idx2 = tree.insert(note2.commitment)
    pool.deposit(10_000_000, note2.amount, note2.commitment, tree.get_root())
    w2 = make_withdraw(tree, ident, note2.amount, recipient, idx2, note2)
    with pytest.raises(PoolError, match="proof verification"):
        pool.withdraw(b"\x00" * st.PROOF_LEN, w2.witness_blob())

    # bad recipient encoding
    blob = bytearray(w2.witness_blob())
    blob[76] = 0xFF
    with pytest.raises(PoolError, match="recipient"):
        pool.withdraw(proof, bytes(blob))

    # unknown root
    blob = bytearray(w2.witness_blob())
    blob[12:44] = (123456789).to_bytes(32, "big")
    with pytest.raises(PoolError, match="root"):
        pool.withdraw(proof, bytes(blob))

    # missing audit record
    other = flows.Identity.generate(777)
    note3 = flows.Note(other, amount=500_000, randomness=2)
    idx3 = tree.insert(note3.commitment)
    pool.deposit(10_000_000, note3.amount, note3.commitment, tree.get_root())
    w3 = flows.build_withdraw_witness(tree, note3, idx3, recipient, note3.amount)
    with pytest.raises(PoolError, match="audit record"):
        pool.withdraw(proof, w3.witness_blob())


def test_relayer_payroll_three_recipients():
    pool = make_pool()
    relayer = Relayer(pool)
    tree = MerkleTree()
    proof = b"\x01" * st.PROOF_LEN

    results = []
    for i in range(3):
        ident = flows.Identity.generate(1000 + i)
        note = flows.Note(ident, amount=2_000_000, randomness=i + 1)
        idx = tree.insert(note.commitment)
        pool.deposit(10_000_000, note.amount, note.commitment, tree.get_root())
        recipient = bytes([i]) * 32
        w = flows.build_withdraw_witness(tree, note, idx, recipient, note.amount)
        audit_wit = flows.audit_witness_blob(ident.wa_commitment, i)
        res = relayer.relay_withdraw(proof, w.witness_blob(), proof, audit_wit)
        results.append(res)
    assert [r.amount for r in results] == [2_000_000] * 3
    assert len({r.recipient for r in results}) == 3
    # repeat audit is idempotent, repeat withdraw double-spends
    with pytest.raises(PoolError, match="nullifier"):
        relayer.relay_withdraw(proof, w.witness_blob(), proof, audit_wit)
    assert relayer.status()["low_balance"] is False


def test_idempotent_initialize_and_audit():
    pool = make_pool()
    s0 = pool.state
    pool.initialize()
    assert pool.state is s0
    proof = b"\x01" * st.PROOF_LEN
    wit = flows.audit_witness_blob(42, 43)
    assert pool.submit_audit(proof, wit) == 42
    # second submission: no verifier call needed (idempotent)
    pool.audit_verifier = lambda *a: (_ for _ in ()).throw(AssertionError)
    assert pool.submit_audit(proof, wit) == 42
