"""BN254 Fr/Fp limb arithmetic vs. Python bigint oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zkpool.fields.fctx import FR, FP


@pytest.mark.parametrize("F", [FR, FP], ids=["Fr", "Fp"])
def test_field_ops(F):
    rng = random.Random(1)
    p = F.modulus
    xs = [rng.randrange(p) for _ in range(61)] + [0, 1, p - 1]
    ys = [rng.randrange(p) for _ in range(61)] + [p - 1, 0, p - 1]
    ax = jnp.asarray(F.to_mont(xs))
    by = jnp.asarray(F.to_mont(ys))

    got = F.from_mont(np.asarray(jax.jit(F.mont_mul)(ax, by)))
    assert all(int(g) == x * y % p for g, x, y in zip(got, xs, ys))

    got = F.from_mont(np.asarray(jax.jit(F.add)(ax, by)))
    assert all(int(g) == (x + y) % p for g, x, y in zip(got, xs, ys))

    got = F.from_mont(np.asarray(jax.jit(F.sub)(ax, by)))
    assert all(int(g) == (x - y) % p for g, x, y in zip(got, xs, ys))

    got = F.from_mont(np.asarray(jax.jit(F.neg)(ax)))
    assert all(int(g) == (-x) % p for g, x in zip(got, xs))


def test_fr_inverse():
    rng = random.Random(2)
    p = FR.modulus
    xs = [rng.randrange(1, p) for _ in range(32)]
    ax = jnp.asarray(FR.to_mont(xs))
    got = FR.from_mont(np.asarray(jax.jit(FR.inv)(ax)))
    assert all(int(g) == pow(x, -1, p) for g, x in zip(got, xs))


def test_roundtrip_and_domain():
    rng = random.Random(3)
    xs = [rng.randrange(FR.modulus) for _ in range(16)]
    back = FR.from_mont(FR.to_mont(xs))
    assert [int(v) for v in back] == xs
