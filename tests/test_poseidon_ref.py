"""Poseidon reference implementation vs. the reference repo's committed vectors."""

from tpu_zkpool.hash.poseidon_params import poseidon_hash_ref as H, poseidon_constants

from vectors import (
    SIBLINGS, WA_COMMITMENT, NULLIFIER, ROOT, SECRET_KEY, OWNER_X, OWNER_Y,
    AMOUNT, RANDOMNESS,
)


def test_default_hash_chain():
    d = 0
    for i in range(1, 16):
        d = H([d, d])
        assert d == SIBLINGS[i], f"level {i}"


def test_wa_commitment():
    assert H([OWNER_X, OWNER_Y]) == WA_COMMITMENT


def test_nullifier():
    assert H([SECRET_KEY, 0]) == NULLIFIER


def test_commitment_and_root():
    commitment = H([OWNER_X, OWNER_Y, AMOUNT, RANDOMNESS])
    cur = commitment
    for i in range(16):
        cur = H([cur, SIBLINGS[i]])  # leaf index 0: always the left child
    assert cur == ROOT


def test_known_circomlib_vector():
    # The widely-reproduced circomlibjs vector poseidon([1,2]).
    assert H([1, 2]) == (
        7853200120776062878684798364095072458815029376092732009249414926327459813530
    )


def test_constant_generation_known_values():
    C, M = poseidon_constants(3)
    assert C[0] == 0x0EE9A592BA9A9518D05986D656F40C2114C4993C11BB29938D21D47304CD8E6E
    assert M[0][0] == 0x109B7F411BA0E4C9B2B70CAF5C36A7B194BE7C11AD24378BFEDB68592BA8118B
