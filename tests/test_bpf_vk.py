"""Interop pin against the deployed BPF verifier program.

The reference commits the actual Solana program that verifies audit
proofs on-chain (``audit_circuit/target/audit_verifier.so``, CPI'd at
``submit_audit.rs:81-87``). No sBPF interpreter exists in this
environment (see docs/PARITY.md), so the strongest offline interop
evidence is byte-level: the verifying key the program uses is EMBEDDED
in its rodata, and every group element of the committed
``rlwe_audit.vk`` — parsed with OUR ``gnark_fmt`` reader — must appear
there byte-for-byte, in gnark's marshal layout (big-endian Fp words; Fp2
as A1 || A0). This pins our VK parser's limb order and the compression
convention against the deployed artifact, not just against our own
emitter."""

import pytest

from tpu_zkpool.groth16 import gnark_fmt

SO = "/root/reference/audit_circuit/target/audit_verifier.so"
VK = "/root/reference/audit_circuit/target/rlwe_audit.vk"

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583


@pytest.fixture(scope="module")
def so_bytes():
    with open(SO, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def vk():
    with open(VK, "rb") as f:
        return gnark_fmt.parse_vk(f.read())


def _be(v):
    return (v % P).to_bytes(32, "big")


def _g1(p):
    return _be(p[0]) + _be(p[1])


def _g2(p):
    # gnark Fp2 marshal: A1 then A0 (uncompressed G2 = x1 x0 y1 y0)
    return _be(p[0][1]) + _be(p[0][0]) + _be(p[1][1]) + _be(p[1][0])


def test_every_vk_element_embedded(so_bytes, vk):
    """alpha, beta, gamma, delta, every gamma_abc point and the Pedersen
    commitment key all appear verbatim in the program's data."""
    for name, blob in [("alpha", _g1(vk.alpha_g1)),
                       ("beta", _g2(vk.beta_g2)),
                       ("gamma", _g2(vk.gamma_g2)),
                       ("delta", _g2(vk.delta_g2))]:
        assert so_bytes.find(blob) >= 0, f"{name} not embedded"
    for i, g in enumerate(vk.gamma_abc):
        assert so_bytes.find(_g1(g)) >= 0, f"gamma_abc[{i}] not embedded"
    assert vk.commitment_keys, "audit VK carries a commitment key"
    g, gsn = vk.commitment_keys[0]
    assert so_bytes.find(_g2(g)) >= 0, "commitment key G not embedded"
    assert so_bytes.find(_g2(gsn)) >= 0, "commitment key GSigmaNeg missing"


def test_vk_layout_contiguous(so_bytes, vk):
    """The pairing-leg elements sit CONTIGUOUSLY (alpha || beta || gamma
    || delta) in one rodata block, and gamma_abc forms a second
    contiguous table followed by the commitment key — i.e. the embedded
    copy is a structured VK, not coincidental byte hits."""
    base = so_bytes.find(_g1(vk.alpha_g1))
    assert base >= 0
    blob = (_g1(vk.alpha_g1) + _g2(vk.beta_g2) + _g2(vk.gamma_g2)
            + _g2(vk.delta_g2))
    assert so_bytes[base:base + len(blob)] == blob
    tbl = so_bytes.find(_g1(vk.gamma_abc[0]))
    assert tbl >= 0
    abc = b"".join(_g1(g) for g in vk.gamma_abc)
    assert so_bytes[tbl:tbl + len(abc)] == abc
    g, gsn = vk.commitment_keys[0]
    ck = _g2(g) + _g2(gsn)
    assert so_bytes[tbl + len(abc):tbl + len(abc) + len(ck)] == ck
