"""BN254 optimal-ate pairing reference: bilinearity / order properties."""

import pytest

from tpu_zkpool.fields.bn254 import G1_GX, G1_GY, FR_MOD
from tpu_zkpool.refimpl import pairing_ref as pr

G1 = (G1_GX, G1_GY)
G2 = pr.G2_GEN


@pytest.fixture(scope="module")
def e1():
    return pr.pairing(G1, G2)


def test_g2_generator_valid():
    assert pr.g2_is_on_curve(G2)
    assert pr.g2_mul(FR_MOD, G2) is None


def test_nondegenerate(e1):
    assert e1 != pr.F12_ONE
    assert pr.f12_pow(e1, FR_MOD) == pr.F12_ONE


def test_bilinearity(e1):
    assert pr.pairing(pr.g1_mul(2, G1), G2) == pr.f12_mul(e1, e1)
    assert pr.pairing(G1, pr.g2_mul(3, G2)) == pr.f12_pow(e1, 3)
    assert pr.pairing(pr.g1_mul(5, G1), pr.g2_mul(7, G2)) == pr.f12_pow(e1, 35)


def test_fp12_inverse():
    f = pr.miller_loop(G1, G2)
    assert pr.f12_mul(f, pr.f12_inv(f)) == pr.F12_ONE


def test_final_exponentiation_fast():
    """Cyclotomic-chain final exp == naive (p^12-1)/r power, plus the
    building blocks (Frobenius, GS squaring, x-power) individually."""
    f = pr.miller_loop(G1, G2)
    assert pr.f12_frobenius(f, 1) == pr.f12_pow(f, pr.P)
    m = pr.f12_mul(pr.f12_conj(f), pr.f12_inv(f))
    m = pr.f12_mul(pr.f12_frobenius(m, 2), m)
    assert pr.f12_cyclotomic_sqr(m) == pr.f12_sqr(m)
    assert pr.f12_pow_x_cyclo(m) == pr.f12_pow(m, pr.BN_X)
    assert pr.final_exponentiation_fast(f) == pr.final_exponentiation(f)
