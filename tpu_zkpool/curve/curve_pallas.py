"""Pallas TPU kernels for batched BN254 Jacobian point arithmetic.

Same register-limb technique as the Poseidon kernel
(``hash/poseidon_pallas.py``): a grid step processes a 1024-point tile with
every 16-bit limb of every coordinate in its own (8, 128) vector register;
complete addition (with the Z=0 / doubling / inverse special cases as
lane-wise selects) runs entirely on the VPU with zero HBM round-trips.

These kernels are the building blocks of the Pallas MSM: the chunked
prefix-scan in ``msm/pippenger.py`` calls `add_pallas` on wide batches so
the serial depth is O(sqrt N) with 1024-lane parallel adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.fields.limbs import NLIMB, MASK, WBITS
from tpu_zkpool.hash.poseidon_pallas import (
    TILE, TILE_N, _mont_mul, _add_mod, _cond_sub_p,
)

_PJ = [np.uint32(v) for v in FP.p_limbs]
_N0 = np.uint32(FP.n0)


def _sub_mod(a, b):
    """a - b mod p on limb lists."""
    borrow = jnp.zeros_like(a[0])
    diff = []
    for i in range(NLIMB):
        d = a[i] - b[i] - borrow
        borrow = d >> 31
        diff.append(d & MASK)
    # add p back when borrowed
    carry = jnp.zeros_like(a[0])
    padd = []
    for i in range(NLIMB):
        v = diff[i] + _PJ[i] + carry
        padd.append(v & MASK)
        carry = v >> WBITS
    return [jnp.where(borrow == 1, pa, d) for pa, d in zip(padd, diff)]


def _dbl_mod(a):
    return _add_mod(a, a, _PJ)


def _is_zero(a):
    acc = a[0]
    for i in range(1, NLIMB):
        acc = acc | a[i]
    return acc == 0


def _mul(a, b):
    return _mont_mul(a, b, _PJ, _N0)


def _select(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _jac_double(X, Y, Z):
    A = _mul(X, X)
    B = _mul(Y, Y)
    C = _mul(B, B)
    xb = _add_mod(X, B, _PJ)
    D = _sub_mod(_sub_mod(_mul(xb, xb), A), C)
    D = _dbl_mod(D)
    E = _add_mod(_dbl_mod(A), A, _PJ)
    F = _mul(E, E)
    X3 = _sub_mod(F, _dbl_mod(D))
    C8 = _dbl_mod(_dbl_mod(_dbl_mod(C)))
    Y3 = _sub_mod(_mul(E, _sub_mod(D, X3)), C8)
    Z3 = _dbl_mod(_mul(Y, Z))
    return X3, Y3, Z3


def _jac_add(P, Q):
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = _mul(Z1, Z1)
    Z2Z2 = _mul(Z2, Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub_mod(U2, U1)
    r = _sub_mod(S2, S1)
    HH = _mul(H, H)
    HHH = _mul(H, HH)
    V = _mul(U1, HH)
    X3 = _sub_mod(_sub_mod(_mul(r, r), HHH), _dbl_mod(V))
    Y3 = _sub_mod(_mul(r, _sub_mod(V, X3)), _mul(S1, HHH))
    Z3 = _mul(_mul(Z1, Z2), H)

    p_inf = _is_zero(Z1)
    q_inf = _is_zero(Z2)
    same_x = _is_zero(H)
    same_y = _is_zero(r)
    dbl = _jac_double(X1, Y1, Z1)
    is_dbl = same_x & same_y & ~p_inf & ~q_inf
    to_inf = same_x & ~same_y & ~p_inf & ~q_inf
    zero = [jnp.zeros_like(X1[0])] * NLIMB

    out = []
    for i, v in enumerate((X3, Y3, Z3)):
        v = _select(is_dbl, dbl[i], v)
        v = _select(to_inf, zero, v)
        v = _select(p_inf, Q[i], v)
        v = _select(q_inf, P[i], v)
        out.append(v)
    return tuple(out)


def _add_kernel(p_ref, q_ref, o_ref):
    def limbs(ref, w):
        return [ref[w, l] for l in range(NLIMB)]

    P = tuple(limbs(p_ref, w) for w in range(3))
    Q = tuple(limbs(q_ref, w) for w in range(3))
    X3, Y3, Z3 = _jac_add(P, Q)
    for w, coord in enumerate((X3, Y3, Z3)):
        for l in range(NLIMB):
            o_ref[w, l] = coord[l]


@functools.partial(jax.jit, static_argnums=(2,))
def _add_tiles(p: jnp.ndarray, q: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """p, q: uint32[nb, 3, 16, 8, 128] -> sum, same shape."""
    nb = p.shape[0]
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3, NLIMB) + TILE, lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, NLIMB) + TILE, lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, NLIMB) + TILE, lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def wrap(p_ref, q_ref, o_ref):
        _add_kernel(p_ref.at[0], q_ref.at[0], o_ref.at[0])

    return pl.pallas_call(
        wrap,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(p, q)


def to_tiles(P) -> jnp.ndarray:
    """(X, Y, Z) uint32[B, 16] triples -> uint32[nb, 3, 16, 8, 128]."""
    X, Y, Z = P
    B = X.shape[0]
    nb = B // TILE_N
    stacked = jnp.stack([X, Y, Z], axis=1)  # (B, 3, 16)
    return stacked.reshape(nb, 8, 128, 3, NLIMB).transpose(0, 3, 4, 1, 2)


def from_tiles(t: jnp.ndarray):
    nb = t.shape[0]
    s = t.transpose(0, 3, 4, 1, 2).reshape(nb * TILE_N, 3, NLIMB)
    return s[:, 0], s[:, 1], s[:, 2]


def add_pallas(P, Q, interpret: bool = False):
    """Batched complete Jacobian addition via the Pallas kernel.

    P, Q: (X, Y, Z) uint32[B, 16] Montgomery triples, B a multiple of 1024.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    return from_tiles(_add_tiles(to_tiles(P), to_tiles(Q), interpret))
