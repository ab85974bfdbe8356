"""RLWE stack vs. the reference's committed artifacts and Python oracles."""

import json
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zkpool.fields import rlweq
from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.refimpl import rlwe_ref
from tpu_zkpool.rlwe import ntt, encrypt, quotient
from tpu_zkpool.shamir import share_batch, reconstruct_batch

import vectors


@pytest.fixture(scope="module")
def committed_pk():
    with open(f"{vectors.RLWE_DIR}/rlwe_pk.json") as f:
        pk = json.load(f)
    return ([int(v, 16) for v in pk["a"]], [int(v, 16) for v in pk["b"]])


def test_rlweq_mont_mul():
    rng = random.Random(5)
    xs = np.array([rng.randrange(rlweq.Q) for _ in range(64)], np.uint32)
    ys = np.array([rng.randrange(rlweq.Q) for _ in range(64)], np.uint32)
    xm = rlweq.to_mont(jnp.asarray(xs))
    ym = rlweq.to_mont(jnp.asarray(ys))
    got = np.asarray(rlweq.from_mont(rlweq.mont_mul(xm, ym)))
    exp = (xs.astype(object) * ys.astype(object)) % rlweq.Q
    assert list(got) == list(exp)


def test_ntt_negacyclic_mul_matches_schoolbook():
    rng = random.Random(6)
    for n in (8, 64, 1024):
        a = [rng.randrange(rlweq.Q) for _ in range(n)]
        b = [rng.randrange(rlweq.Q) for _ in range(n)]
        exp = rlwe_ref.negacyclic_mul(a, b, n=n)
        got = jax.jit(ntt.negacyclic_mul)(
            jnp.asarray(np.array(a, np.uint32)), jnp.asarray(np.array(b, np.uint32))
        )
        assert [int(v) for v in np.asarray(got)] == exp


def test_keygen_bit_exact_vs_committed(committed_pk):
    a_ref, b_ref = committed_pk
    kg = rlwe_ref.keygen(42)
    assert kg["a"] == a_ref and kg["b"] == b_ref
    # TPU path reproduces b from the same randomness
    b_dev = encrypt.keygen_from_randomness(
        jnp.asarray(encrypt.signed_to_mod_q(kg["sk_signed"])),
        jnp.asarray(np.array(kg["a"], np.uint32)),
        jnp.asarray(encrypt.signed_to_mod_q([v % rlweq.Q for v in kg["e_signed"]])),
    )
    assert [int(v) for v in np.asarray(b_dev)] == b_ref


def test_shamir_shares_bit_exact_vs_committed():
    kg = rlwe_ref.keygen(42)
    for idx in (1, 2, 3):
        with open(f"{vectors.RLWE_DIR}/rlwe_sk_shares/share_{idx}.json") as f:
            sh = json.load(f)
        ours = kg["shares"][idx - 1]
        assert all(
            c["x"] == o[0] and int(c["y"], 16) == o[1]
            for c, o in zip(sh["coefficients"], ours)
        )


def test_shamir_tpu_share_reconstruct_roundtrip():
    rng = random.Random(9)
    p = FR.modulus
    secrets = [rng.randrange(p) for _ in range(32)]
    rand_coeffs = [rng.randrange(p) for _ in range(32)]
    s_m = jnp.asarray(FR.to_mont(np.asarray(secrets, dtype=object)))
    c_m = jnp.asarray(FR.to_mont(np.asarray([rand_coeffs], dtype=object)))
    shares = share_batch(s_m, c_m)  # (3, 32, 16)
    # matches the Python oracle per share
    for k in range(3):
        vals = FR.from_mont(np.asarray(shares[k]))
        for i in range(32):
            exp = (secrets[i] + rand_coeffs[i] * (k + 1)) % p
            assert int(vals[i]) == exp
    # reconstruct from shares 1,2 and from 2,3
    rec = FR.from_mont(np.asarray(reconstruct_batch(shares[:2], xs=(1, 2))))
    assert [int(v) for v in rec] == secrets
    rec23 = FR.from_mont(np.asarray(reconstruct_batch(shares[1:], xs=(2, 3))))
    assert [int(v) for v in rec23] == secrets


def test_encrypt_decrypt_tpu_bit_exact(committed_pk):
    a_ref, b_ref = committed_pk
    # reference encryption (seed 999) — without quotients for speed
    rng = random.Random(999)
    msg = encrypt.encode_message(vectors.OWNER_X, vectors.OWNER_Y)
    r_s = [rng.randint(-3, 3) for _ in range(rlwe_ref.N)]
    e1_s = [rng.randint(-3, 3) for _ in range(rlwe_ref.MSG_SLOTS)]
    e2_s = [rng.randint(-3, 3) for _ in range(rlwe_ref.N)]

    c0, c1 = encrypt.encrypt_core(
        jnp.asarray(np.array(a_ref, np.uint32)),
        jnp.asarray(np.array(b_ref, np.uint32)),
        jnp.asarray(encrypt.signed_to_mod_q(r_s)),
        jnp.asarray(encrypt.signed_to_mod_q(e1_s)),
        jnp.asarray(encrypt.signed_to_mod_q(e2_s)),
        jnp.asarray((msg * rlwe_ref.DELTA % rlweq.Q).astype(np.uint32)),
    )
    # vs schoolbook oracle
    r_q = [v % rlweq.Q for v in r_s]
    br = rlwe_ref.negacyclic_mul(b_ref, r_q)
    exp_c0 = [
        (br[i] + e1_s[i] + rlwe_ref.DELTA * int(msg[i])) % rlweq.Q
        for i in range(rlwe_ref.MSG_SLOTS)
    ]
    assert [int(v) for v in np.asarray(c0)] == exp_c0

    # decrypt on TPU with reference sk
    kg = rlwe_ref.keygen(42)
    sk_q = jnp.asarray(encrypt.signed_to_mod_q(kg["sk_signed"]))
    slots = encrypt.decrypt_core(sk_q, c0, c1)
    x, y = encrypt.decode_message(slots)
    assert (x, y) == (vectors.OWNER_X, vectors.OWNER_Y)


def test_quotient_witnesses(committed_pk):
    a_ref, b_ref = committed_pk
    rng = random.Random(999)
    msg = encrypt.encode_message(vectors.OWNER_X, vectors.OWNER_Y)
    r_s = [rng.randint(-3, 3) for _ in range(rlwe_ref.N)]
    e1_s = [rng.randint(-3, 3) for _ in range(rlwe_ref.MSG_SLOTS)]
    e2_s = [rng.randint(-3, 3) for _ in range(rlwe_ref.N)]

    # c1 rows: full = <A_k, r> + e2[k]
    k1, rem1 = quotient.quotient_witnesses(a_ref, r_s, np.array(e2_s))
    # oracle for a few rows
    for i in (0, 1, 511, 1023):
        row = rlwe_ref.negacyclic_matrix_row(a_ref, i)
        ip = sum(row[j] * r_s[j] for j in range(rlwe_ref.N))
        full = ip + e2_s[i]
        assert int(rem1[i]) == full % rlwe_ref.RLWE_Q
        assert int(k1[i]) == (full - full % rlwe_ref.RLWE_Q) // rlwe_ref.RLWE_Q
    # sparse c0 rows
    extra = np.array([e1_s[i] + rlwe_ref.DELTA * int(msg[i]) for i in range(64)]
                     + [0] * (rlwe_ref.N - 64))
    k0, rem0 = quotient.quotient_witnesses(b_ref, r_s, extra)
    row = rlwe_ref.negacyclic_matrix_row(b_ref, 5)
    full = sum(row[j] * r_s[j] for j in range(rlwe_ref.N)) + int(extra[5])
    assert int(rem0[5]) == full % rlwe_ref.RLWE_Q
    assert int(k0[5]) == (full - full % rlwe_ref.RLWE_Q) // rlwe_ref.RLWE_Q
