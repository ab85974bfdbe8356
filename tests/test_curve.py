"""Batched Jacobian curve ops vs. the affine reference and committed vectors."""

import random

import jax
import jax.numpy as jnp

from tpu_zkpool.curve.weierstrass import EMBEDDED, G1
from tpu_zkpool.refimpl import curve_ref
from tpu_zkpool.refimpl import pairing_ref as pr
from tpu_zkpool.fields.bn254 import G1_GX, G1_GY

import vectors


def test_embedded_scalar_mul_batch():
    ks = [12345, vectors.SECRET_KEY, 1, 0]
    C = EMBEDDED
    Gpts = C.from_affine_ints([C.gen[0]] * len(ks), [C.gen[1]] * len(ks))
    bits = jnp.asarray(C.bits_from_ints(ks, 128))
    P = jax.jit(C.scalar_mul)(bits, Gpts)
    xs, ys = C.to_affine_ints(P)
    for i, k in enumerate(ks):
        exp = curve_ref.scalar_mul(k) or (0, 0)
        assert (int(xs[i]), int(ys[i])) == exp, k
    # the committed identity vector
    assert (int(xs[1]), int(ys[1])) == (vectors.OWNER_X, vectors.OWNER_Y)


def test_embedded_add_double_identity():
    C = EMBEDDED
    P1 = curve_ref.scalar_mul(777)
    P2 = curve_ref.scalar_mul(888)
    A = C.from_affine_ints([P1[0], P1[0]], [P1[1], P1[1]])
    B = C.from_affine_ints([P2[0], P1[0]], [P2[1], P1[1]])
    S = jax.jit(C.add)(A, B)
    xs, ys = C.to_affine_ints(S)
    assert (int(xs[0]), int(ys[0])) == curve_ref.add(P1, P2)
    assert (int(xs[1]), int(ys[1])) == curve_ref.add(P1, P1)
    # P + (-P) = infinity
    N1 = C.from_affine_ints([P1[0]], [(-P1[1]) % C.F.modulus])
    I = jax.jit(C.add)(C.from_affine_ints([P1[0]], [P1[1]]), N1)
    assert bool(C.F.is_zero(I[2])[0])


def test_g1_ops_match_pairing_ref():
    rng = random.Random(3)
    k = rng.randrange(1 << 60)
    exp = pr.g1_mul(k, (G1_GX, G1_GY))
    C = G1
    Gp = C.from_affine_ints([G1_GX], [G1_GY])
    bits = jnp.asarray(C.bits_from_ints([k], 64))
    P = jax.jit(C.scalar_mul)(bits, Gp)
    xs, ys = C.to_affine_ints(P)
    assert (int(xs[0]), int(ys[0])) == exp


def test_fixed_base_windowed_table():
    """Windowed fixed-base scalar mul vs the committed identity vector and
    the generic double-and-add path (noir fixed_base_scalar_mul analogue)."""
    import numpy as np
    import jax.numpy as jnp
    import vectors
    from tpu_zkpool.curve.fixed_base import embedded_generator_table
    from tpu_zkpool.curve.weierstrass import EMBEDDED

    tbl = embedded_generator_table(c=8)
    ks = [vectors.SECRET_KEY, 1, 2, 12345, (1 << 128) - 1]
    X, Y, Z = tbl.mul_ints(ks)
    xs, ys = EMBEDDED.to_affine_ints((X, Y, Z))
    assert int(np.asarray(xs)[0]) == vectors.OWNER_X
    assert int(np.asarray(ys)[0]) == vectors.OWNER_Y
    assert int(np.asarray(xs)[1]) == EMBEDDED.gen[0]
    # cross-check one more against the host reference
    from tpu_zkpool.refimpl import curve_ref
    exp = curve_ref.scalar_mul(12345)
    assert (int(np.asarray(xs)[3]), int(np.asarray(ys)[3])) == exp
