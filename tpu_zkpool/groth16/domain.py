"""Fr-domain radix-2 NTT on TPU limbs — the prover's FFT engine.

Same DIF/DIT no-bit-reversal structure as ``tpu_zkpool.rlwe.ntt`` but over
the 254-bit BN254 scalar field in 16x16-bit limb form (Fr - 1 = 2^28 * odd,
generator 5), used for the Groth16 H(X) = (UV - W)/t computation on device
(the reference's equivalent work happens inside gnark's FFT during
`sunspot prove`). Includes coset evaluation helpers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.bn254 import FR_MOD as R
from tpu_zkpool.fields.fctx import FR

COSET_G = 5


def _root(n: int) -> int:
    assert n & (n - 1) == 0 and n <= 1 << 28
    return pow(5, (R - 1) // n, R)


@functools.lru_cache(maxsize=None)
def _tables(n: int):
    omega = _root(n)
    omega_inv = pow(omega, -1, R)
    n_inv = pow(n, -1, R)
    fwd, inv = [], []
    h = n // 2
    while h >= 1:
        step = n // (2 * h)
        fwd.append(FR.to_mont(np.asarray(
            [pow(omega, step * j, R) for j in range(h)], dtype=object)))
        h //= 2
    h = 1
    while h <= n // 2:
        step = n // (2 * h)
        inv.append(FR.to_mont(np.asarray(
            [pow(omega_inv, step * j, R) for j in range(h)], dtype=object)))
        h *= 2
    ninv_m = FR.to_mont(np.asarray([n_inv], dtype=object))[0]
    coset = FR.to_mont(np.asarray(
        [pow(COSET_G, i, R) for i in range(n)], dtype=object))
    coset_inv = FR.to_mont(np.asarray(
        [pow(pow(COSET_G, -1, R), i, R) for i in range(n)], dtype=object))
    return fwd, inv, ninv_m, coset, coset_inv


@functools.lru_cache(maxsize=None)
def tables_device(n: int):
    """All NTT/coset tables as device-resident arrays, to be passed as jit
    ARGUMENTS: baking them into the graph as trace-time constants puts
    ~0.5 GB of literals in a 2^21-domain HLO (sum of twiddles ~ n*16*u32
    per direction + two full coset tables), which broke the remote-compile
    transport outright and bloats every compile. Returns
    (fwd_tws, inv_tws, ninv, coset, coset_inv, bitrev)."""
    fwd, inv, ninv_m, coset, coset_inv = _tables(n)
    put = jax.device_put
    return (tuple(put(jnp.asarray(t)) for t in fwd),
            tuple(put(jnp.asarray(t)) for t in inv),
            put(jnp.asarray(ninv_m)),
            put(jnp.asarray(coset)),
            put(jnp.asarray(coset_inv)),
            put(jnp.asarray(bitrev_perm(n))))


def forward(x: jnp.ndarray, tws=None) -> jnp.ndarray:
    """DIF NTT along axis -2 of uint32[..., n, 16] Montgomery values
    (natural order in, bit-reversed out)."""
    n = x.shape[-2]
    if tws is None:
        tws = _tables(n)[0]
    y = x
    for tw in tws:
        h = tw.shape[0]
        blocks = y.reshape(y.shape[:-2] + (n // (2 * h), 2 * h, 16))
        u = blocks[..., :h, :]
        v = blocks[..., h:, :]
        s = FR.add(u, v)
        d = FR.mont_mul(FR.sub(u, v), jnp.asarray(tw))
        y = jnp.concatenate([s, d], axis=-2).reshape(y.shape)
    return y


def inverse(y: jnp.ndarray, tws=None, ninv=None) -> jnp.ndarray:
    n = y.shape[-2]
    if tws is None:
        _, tws, ninv, _, _ = _tables(n)
    ninv_m = ninv
    x = y
    for tw in tws:
        h = tw.shape[0]
        blocks = x.reshape(x.shape[:-2] + (n // (2 * h), 2 * h, 16))
        u = blocks[..., :h, :]
        v = FR.mont_mul(blocks[..., h:, :], jnp.asarray(tw))
        x = jnp.concatenate([FR.add(u, v), FR.sub(u, v)], axis=-2).reshape(
            y.shape)
    return FR.mont_mul(x, jnp.asarray(ninv_m))


@functools.lru_cache(maxsize=None)
def bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = int(bin(i)[2:].zfill(bits)[::-1], 2)
    return out


def interpolate_natural(evals: jnp.ndarray, br=None, tws=None,
                        ninv=None) -> jnp.ndarray:
    """Natural-order domain evaluations -> coefficients.

    ``inverse`` consumes the bit-reversed layout that ``forward`` produces;
    natural-order evaluations (E[i] = P(omega^i)) need the bit-reversal
    gather first.
    """
    n = evals.shape[-2]
    if br is None:
        br = jnp.asarray(bitrev_perm(n))
    return inverse(evals[..., br, :], tws, ninv)


def coset_forward(coeffs: jnp.ndarray, coset=None, tws=None) -> jnp.ndarray:
    """Evaluate a coefficient vector on the coset g*omega^i (BR order)."""
    n = coeffs.shape[-2]
    if coset is None:
        coset = jnp.asarray(_tables(n)[3])
    return forward(FR.mont_mul(coeffs, coset), tws)


def coset_inverse(evals: jnp.ndarray, coset_inv=None, tws=None,
                  ninv=None) -> jnp.ndarray:
    n = evals.shape[-2]
    if coset_inv is None:
        coset_inv = jnp.asarray(_tables(n)[4])
    return FR.mont_mul(inverse(evals, tws, ninv), coset_inv)
