"""Host-side client components: errors (C24), storage (C23), proof-hex
tooling (C20)."""

import pytest

from tpu_zkpool.protocol import errors as er
from tpu_zkpool.protocol.state import PoolError
from tpu_zkpool.protocol import storage as stg
from tpu_zkpool.protocol import proof_hex as ph


def test_error_parse_and_hints():
    e = er.parse_pool_error(PoolError("nullifier already used"))
    assert e.code == er.ErrorCode.NULLIFIER_ALREADY_USED
    assert "once" in e.recovery_hint
    e2 = er.parse_pool_error(PoolError("unknown root"))
    assert e2.code == er.ErrorCode.ROOT_EXPIRED
    e3 = er.parse_pool_error(ValueError("boom"))
    assert e3.code == er.ErrorCode.TRANSACTION_FAILED
    st = er.error_status(PoolError("proof verification failed"))
    assert st.type == "error" and st.hint


def test_storage_roundtrip(tmp_path):
    from tpu_zkpool.protocol.flows import Identity, Note
    from tpu_zkpool.merkle.tree import MerkleTree

    path = str(tmp_path / "store.json")
    s = stg.Store(path)
    ident = Identity.generate(12345)
    note = Note(ident, amount=1_000_000, randomness=777)
    tree = MerkleTree()
    idx = tree.insert(note.commitment)
    rec = stg.deposit_record_from_flow(note, tree, idx)
    s.save_deposit(rec)
    s.save_merkle_state([hex(l) for l in tree.leaves], hex(tree.get_root()))
    s.log_audit("0x1", rec.wa_commitment, "0x2", "sig")

    s2 = stg.Store(path)   # reload from disk
    got = s2.get_deposit(rec.id)
    assert got.secret_key == hex(12345) and got.leaf_index == idx
    assert got.nullifier == hex(note.nullifier(idx))
    assert s2.merkle_state().last_synced_root == hex(tree.get_root())
    assert len(s2.audit_logs()) == 1

    # status transitions + filtered listing
    assert s2.all_deposits(status="pending")
    s2.mark_withdrawn(rec.id, "txsig")
    assert not s2.all_deposits(status="pending")
    assert s2.get_deposit(rec.id).withdraw_tx_signature == "txsig"

    # export / import (storage.ts:233-250)
    dump = s2.export_data()
    s3 = stg.Store(str(tmp_path / "other.json"))
    s3.import_deposits(dump["deposits"])
    assert s3.get_deposit(rec.id).commitment == rec.commitment

    with pytest.raises(stg.ShieldedPoolError):
        s3.get_deposit("0xdead")


def test_proof_hex_bundle(tmp_path):
    from tpu_zkpool.refimpl import pairing_ref as pr
    from tpu_zkpool.fields.bn254 import G1_GX, G1_GY
    from tpu_zkpool.groth16.gnark_fmt import parse_proof

    a = pr.g1_mul(3, (G1_GX, G1_GY))
    c = pr.g1_mul(5, (G1_GX, G1_GY))
    b2 = pr.g2_mul(7, pr.G2_GEN)
    cm = pr.g1_mul(11, (G1_GX, G1_GY))
    pok = pr.g1_mul(13, (G1_GX, G1_GY))
    payload = ph.bundle((a, b2, c, cm, pok), b"\x00" * 172)
    assert len(bytes.fromhex(payload["withdraw"]["proof_hex"])) == 388
    p = str(tmp_path / "proof-hex.json")
    ph.save_bundle(p, payload)
    loaded = ph.load_bundle(p)
    pf = parse_proof(bytes.fromhex(loaded["withdraw"]["proof_hex"]))
    assert pf.ar == a and pf.commitments == [cm]

    bad = dict(payload)
    bad["withdraw"] = {"proof_hex": "zz", "witness_hex": ""}
    ph.save_bundle(p, bad)
    with pytest.raises(ph.ShieldedPoolError):
        ph.load_bundle(p)


def test_address_table():
    addrs = {k: f"addr_{k}" for k in ph.AddressTable.STATIC_KEYS}
    alt = ph.AddressTable(addrs)
    names = ["vault", "pool_state", "recipient_slot"]
    packed = alt.compress(names)
    assert len(packed) == 3
    assert alt.expand(packed) == [addrs[n] for n in names]


def test_metrics_registry():
    from tpu_zkpool.utils.metrics import Metrics
    m = Metrics()
    m.incr("x")
    m.incr("x", 2)
    with m.timer("t"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["x"] == 3
    assert snap["timings"]["t"]["count"] == 1
    m.reset()
    assert m.snapshot() == {"counters": {}, "timings": {}}
