"""Fr-domain NTT vs. the Python FFT oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.groth16 import domain
from tpu_zkpool.refimpl.groth16_ref import fr_fft, fr_ifft
from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.fields.bn254 import FR_MOD as R


def test_roundtrips():
    rng = random.Random(8)
    coeffs = [rng.randrange(R) for _ in range(32)]
    dev = jnp.asarray(FR.to_mont(np.asarray(coeffs, dtype=object)))
    rt = FR.from_mont(np.asarray(jax.jit(
        lambda x: domain.inverse(domain.forward(x)))(dev)))
    assert [int(v) for v in rt] == coeffs
    crt = FR.from_mont(np.asarray(jax.jit(
        lambda x: domain.coset_inverse(domain.coset_forward(x)))(dev)))
    assert [int(v) for v in crt] == coeffs


def test_convolution_matches_python_fft():
    rng = random.Random(9)
    n = 32
    a = [rng.randrange(R) for _ in range(n // 2)] + [0] * (n // 2)
    b = [rng.randrange(R) for _ in range(n // 2)] + [0] * (n // 2)
    fa = domain.forward(jnp.asarray(FR.to_mont(np.asarray(a, dtype=object))))
    fb = domain.forward(jnp.asarray(FR.to_mont(np.asarray(b, dtype=object))))
    prod = domain.inverse(FR.mont_mul(fa, fb))
    got = [int(v) for v in FR.from_mont(np.asarray(prod))]
    exp = fr_ifft([x * y % R for x, y in zip(fr_fft(a), fr_fft(b))])
    assert got == exp
