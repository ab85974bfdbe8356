"""Merkle tree vs. the reference client-tree semantics and committed root."""

import pytest

from tpu_zkpool.hash.poseidon_params import poseidon_hash_ref as H
from tpu_zkpool.merkle import MerkleTree, default_hashes

import vectors


def test_default_hashes_match_siblings():
    dh = default_hashes(16)
    assert list(dh[:16]) == vectors.SIBLINGS


def test_single_leaf_root_matches_committed():
    commitment = H([vectors.OWNER_X, vectors.OWNER_Y, vectors.AMOUNT,
                    vectors.RANDOMNESS])
    t = MerkleTree()
    idx = t.insert(commitment)
    assert idx == 0
    assert t.get_root() == vectors.ROOT
    assert t.get_proof(0) == vectors.SIBLINGS


def test_multi_leaf_proofs():
    t = MerkleTree()
    leaves = [1111, 2222, 3333, 4444, 5555]
    for v in leaves:
        t.insert(v)
    root = t.get_root()
    for i, leaf in enumerate(leaves):
        proof = t.get_proof(i)
        assert MerkleTree.verify_proof(leaf, i, proof, root), i
    # tamper check
    bad = t.get_proof(2)
    bad[0] = (bad[0] + 1) % (2**250)
    assert not MerkleTree.verify_proof(leaves[2], 2, bad, root)
