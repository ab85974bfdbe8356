"""R1CS builder gadgets vs. the hash references."""

from tpu_zkpool.groth16.builder import CircuitBuilder
from tpu_zkpool.fields.bn254 import FR_MOD as R
from tpu_zkpool.hash.poseidon_params import poseidon_hash_ref
from tpu_zkpool.hash import poseidon2


def test_poseidon_gadget():
    b = CircuitBuilder()
    out = b.public_input()
    x, y = b.private_input(), b.private_input()
    h = b.poseidon_hash([{x: 1}, {y: 1}])
    b.assert_eq({h: 1}, {out: 1})
    r1cs = b.r1cs()
    exp = poseidon_hash_ref([111, 222])
    w = b.witness({out: exp, x: 111, y: 222})
    assert r1cs.is_satisfied(w)
    assert not r1cs.is_satisfied(b.witness({out: exp + 1, x: 111, y: 222}))


def test_poseidon2_gadget():
    b = CircuitBuilder()
    ins = [b.private_input() for _ in range(4)]
    outs = b.poseidon2_permutation([{v: 1} for v in ins])
    outv = []
    for o in outs:
        v = b.aux(lambda w, s=dict(o): CircuitBuilder._eval(s, w))
        b.assert_eq(o, {v: 1})
        outv.append(v)
    w = b.witness({v: i for v, i in zip(ins, [0, 1, 2, 3])})
    assert [w[v] for v in outv] == poseidon2.permutation_ref([0, 1, 2, 3])
    assert b.r1cs().is_satisfied(w)


def test_bits_gadget():
    b = CircuitBuilder()
    x = b.private_input()
    bits = b.bits({x: 1}, 16)
    r1cs = b.r1cs()
    w = b.witness({x: 0xBEEF})
    assert r1cs.is_satisfied(w)
    assert [w[bv] for bv in bits[:8]] == [1, 1, 1, 1, 0, 1, 1, 1]
    # out-of-range value fails the decomposition constraint
    assert not r1cs.is_satisfied(b.witness({x: 1 << 16}))


def test_fixed_base_gadget_in_builder():
    """sk*G gadget (gadgets.py) against the committed identity vector:
    SECRET_KEY * G == (OWNER_X, OWNER_Y); a forged point fails."""
    import vectors
    from tpu_zkpool.groth16.gadgets import (
        fixed_base_scalar_mul_gadget, _aff_dbl)

    b = CircuitBuilder()
    v_x = b.public_input()
    v_y = b.public_input()
    v_sk = b.private_input()
    v_lo = b.aux(lambda w: w[v_sk] & ((1 << 128) - 1))
    v_hi = b.aux(lambda w: w[v_sk] >> 128)
    b.assert_eq({v_sk: 1}, {v_lo: 1, v_hi: pow(2, 128, R)})
    fixed_base_scalar_mul_gadget(b, {v_lo: 1}, {v_hi: 1},
                                 {v_x: 1}, {v_y: 1})
    r1cs = b.r1cs()
    w = b.witness({v_x: vectors.OWNER_X, v_y: vectors.OWNER_Y,
                   v_sk: vectors.SECRET_KEY})
    assert r1cs.is_satisfied(w)
    fx, fy = _aff_dbl((vectors.OWNER_X, vectors.OWNER_Y))
    wbad = b.witness({v_x: fx, v_y: fy, v_sk: vectors.SECRET_KEY})
    assert not r1cs.is_satisfied(wbad)


def test_gadget_tables_and_sqrt():
    """Fixed-base gadget internals: Tonelli-Shanks square root, the
    generator power table, and the unknown-DL offset point are on-curve."""
    from tpu_zkpool.groth16 import gadgets as g
    from tpu_zkpool.fields.bn254 import (
        FR_MOD, EMBEDDED_B, EMBEDDED_GX, EMBEDDED_GY)

    assert g._sqrt_mod_r(4) in (2, FR_MOD - 2)
    assert g._sqrt_mod_r(5) is None or pow(g._sqrt_mod_r(5), 2, FR_MOD) == 5
    pows, S = g._tables()
    assert pows[0] == (EMBEDDED_GX, EMBEDDED_GY)
    for pt in (pows[1], pows[255], S):
        x, y = pt
        assert (y * y - (x ** 3 + EMBEDDED_B)) % FR_MOD == 0
    # 2^i G chain consistency
    assert g._aff_dbl(pows[10]) == pows[11]
