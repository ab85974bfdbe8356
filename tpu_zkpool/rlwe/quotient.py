"""Quotient-witness computation for the RLWE audit circuit, MXU-friendly.

The audit circuit proves c + k*q == <row, r> + noise over BN254 with integer
quotients k (reference ``scripts/generate_audit.py:236-243,528-557``). The
inner products run over the INTEGERS (signed r, values up to ~2^40), beyond
int32 — so the negacyclic matrix is decomposed into four signed 7-bit limb
matrices and the products run as int8 matmuls with int32 accumulation (the
TPU MXU's native integer path); limb sums recombine in int64 on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.refimpl.rlwe_ref import RLWE_Q, N


@functools.lru_cache(maxsize=None)
def _negacyclic_limb_matrices(pk_key: tuple) -> tuple:
    """7-bit limb decomposition of the mod-q negacyclic matrix of ``pk``.

    A[k][j] = pk[k-j] for k >= j, else (q - pk[k-j+n]) mod q — the POSITIVE
    mod-q representatives, exactly as the circuit's constant rows
    (``scripts/generate_audit.py:57-66``); the quotient witnesses depend on
    this choice of representative. Returns 4 int8 matrices A_l (entries in
    [0, 127]) with A = sum_l A_l * 2^(7l).
    """
    pk = np.asarray(pk_key, dtype=np.int64)
    n = pk.shape[0]
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    idx = (k - j) % n
    mat = np.where(k >= j, pk[idx], (RLWE_Q - pk[idx]) % RLWE_Q)
    limbs = []
    for l in range(4):
        limbs.append(((mat >> (7 * l)) & 0x7F).astype(np.int8))
    return tuple(limbs)


def integer_negacyclic_products(pk, r_signed) -> np.ndarray:
    """Exact integer products <A_k, r> for all rows k, batched over r.

    pk: sequence of N ints in [0, q); r_signed: int array [..., N] with small
    entries (|r| <= 127). Returns int64[..., N].
    """
    limbs = _negacyclic_limb_matrices(tuple(int(v) for v in pk))
    r = jnp.asarray(np.asarray(r_signed, dtype=np.int8))
    partials = []
    for A in limbs:
        Aj = jnp.asarray(A)
        # (..., N) x (N, N)^T : out[..., k] = sum_j A[k, j] r[..., j]
        partials.append(
            jax.jit(lambda rr, M: jnp.matmul(rr.astype(jnp.int32), M.T.astype(jnp.int32),
                                             preferred_element_type=jnp.int32))(r, Aj)
        )
    total = np.zeros(np.asarray(partials[0]).shape, dtype=np.int64)
    for l, pval in enumerate(partials):
        total += np.asarray(pval, dtype=np.int64) << (7 * l)
    return total


def quotient_witnesses(pk, r_signed, extra) -> tuple:
    """k, rem with full = <A_k, r> + extra = k*q + rem, rem in [0, q).

    ``extra`` broadcasts against the row axis (e.g. e2[k] or
    e1[k] + DELTA*msg[k] for the sparse rows). Returns (k, rem) as int64
    numpy arrays (k can be negative).
    """
    full = integer_negacyclic_products(pk, r_signed) + np.asarray(extra, dtype=np.int64)
    rem = full % RLWE_Q
    k = (full - rem) // RLWE_Q
    return k, rem
