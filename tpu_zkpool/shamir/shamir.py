"""Shamir 2-of-3 secret sharing over BN254 Fr, batched on TPU.

Reference semantics: ``scripts/rlwe_keygen.py:51-82`` — degree-(threshold-1)
polynomials evaluated at x = 1..num_shares; reconstruction by Lagrange
interpolation at 0. The reference loops per coefficient (1024 sequential
bigint rounds); here all coefficients process in ONE batched limb-field op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.fctx import FR


@jax.jit
def share_batch(secrets, coeffs):
    """Evaluate y_k = secret + sum_j coeffs_j * (k+1)^(j+1) for k = 0..S-1.

    secrets: uint32[..., 16] Montgomery; coeffs: uint32[T-1, ..., 16]
    Montgomery random polynomial coefficients. Returns uint32[S, ..., 16]
    for S = 3 shares (threshold T = coeffs.shape[0] + 1).
    """
    n_coeffs = coeffs.shape[0]
    shares = []
    for x in (1, 2, 3):
        acc = secrets
        x_pow = x
        for j in range(n_coeffs):
            xm = jnp.asarray(FR.to_mont([x_pow]))[0]
            acc = FR.add(acc, FR.mont_mul(coeffs[j], xm))
            x_pow *= x
        shares.append(acc)
    return jnp.stack(shares, axis=0)


def _lagrange_at_zero(xs):
    """Host: Lagrange basis coefficients L_i(0) for points xs (ints)."""
    p = FR.modulus
    out = []
    for i, xi in enumerate(xs):
        num, den = 1, 1
        for j, xj in enumerate(xs):
            if i != j:
                num = num * (-xj) % p
                den = den * (xi - xj) % p
        out.append(num * pow(den, -1, p) % p)
    return out


def reconstruct_batch(ys, xs=(1, 2)):
    """secret = sum_i L_i(0) * y_i for shares at x-coords ``xs``.

    ys: uint32[T, ..., 16] Montgomery share values. One batched op for any
    number of coefficients (vs. the reference's per-coefficient loop,
    ``scripts/rlwe_decrypt.py:73-80``).
    """
    lag = _lagrange_at_zero(list(xs))
    lm = jnp.asarray(FR.to_mont(np.asarray(lag, dtype=object)))
    acc = FR.mont_mul(ys[0], lm[0])
    for i in range(1, len(xs)):
        acc = FR.add(acc, FR.mont_mul(ys[i], lm[i]))
    return acc
