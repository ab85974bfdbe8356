"""Pallas TPU kernel for batched Poseidon hashing — the speed-of-light path.

Design (per the TPU kernel playbook):

- A grid step processes a TILE of 1024 hashes; every 16-bit limb of every
  state wire lives in its own (8, 128) vector register, so ALL limb
  arithmetic is pure elementwise VPU work — no sublane shuffles, no
  dynamic slicing, no HBM traffic between rounds (the full 65-round
  permutation runs out of VMEM/registers).
- Montgomery multiplication is fully unrolled product-scanning (bounds as
  in fields/fctx.py: columns < 2^22 in uint32 lanes).
- The MDS mix uses LAZY REDUCTION: per output wire the three unreduced
  31-column products accumulate first (columns < 3 * 2^21), then a single
  Montgomery reduction — 3 reductions per round instead of 9.
- Partial rounds run under jax.lax.fori_loop with per-round constants
  loaded from VMEM; full rounds likewise (keeps the Mosaic program small).

Layout contract: inputs uint32[nblocks, 16, 8, 128] per wire (limb-major,
then the 1024-lane tile); `hash2_pallas` handles the host-side reshape
from the library's (B, 16) form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.fields.limbs import NLIMB, MASK, WBITS
from tpu_zkpool.hash.poseidon import _mont_tables
from tpu_zkpool.hash.poseidon_params import N_ROUNDS_F, N_ROUNDS_P

TILE = (8, 128)
TILE_N = 8 * 128


def _mul_cols(a, b):
    """Unreduced product columns of two 16-limb numbers: list of 32 (8,128)
    uint32 arrays, each < 32 * 2^16."""
    cols = [None] * (2 * NLIMB)
    for i in range(NLIMB):
        for j in range(NLIMB):
            p = a[i] * b[j]
            lo = p & MASK
            hi = p >> WBITS
            c = i + j
            cols[c] = lo if cols[c] is None else cols[c] + lo
            cols[c + 1] = hi if cols[c + 1] is None else cols[c + 1] + hi
    return cols


def _add_cols(c1, c2):
    return [x + y for x, y in zip(c1, c2)]


def _reduce(cols, pj, n0):
    """Montgomery reduction of 32 columns (each < 2^24) -> 16 canonical limbs."""
    cols = list(cols) + [jnp.zeros_like(cols[0])]
    for i in range(NLIMB):
        m = (cols[i] * n0) & MASK
        for j in range(NLIMB):
            mp = m * pj[j]
            cols[i + j] = cols[i + j] + (mp & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> WBITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> WBITS)
    out = []
    carry = jnp.zeros_like(cols[0])
    for i in range(NLIMB, 2 * NLIMB):
        v = cols[i] + carry
        out.append(v & MASK)
        carry = v >> WBITS
    return _cond_sub_p(out, pj)


def _cond_sub_p(limbs, pj):
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(NLIMB):
        d = limbs[i] - pj[i] - borrow
        borrow = d >> 31
        diff.append(d & MASK)
    keep = borrow  # 1 -> keep original
    return [jnp.where(keep == 1, o, d) for o, d in zip(limbs, diff)]


def _mont_mul(a, b, pj, n0):
    return _reduce(_mul_cols(a, b), pj, n0)


def _add_mod(a, b, pj):
    carry = jnp.zeros_like(a[0])
    s = []
    for i in range(NLIMB):
        v = a[i] + b[i] + carry
        s.append(v & MASK)
        carry = v >> WBITS
    return _cond_sub_p(s, pj)


def _x5(x, pj, n0):
    x2 = _mont_mul(x, x, pj, n0)
    x4 = _mont_mul(x2, x2, pj, n0)
    return _mont_mul(x4, x, pj, n0)


def _make_kernel(t: int):
    r_f, r_p = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    half = r_f // 2
    p_limbs = [np.uint32(v) for v in FR.p_limbs]
    n0 = np.uint32(FR.n0)

    def kernel(cpre_ref, cmid_ref, cpost_ref, m_ref, in_ref, out_ref):
        pj = p_limbs

        def load_state():
            # wire 0 is the zero capacity wire; wires 1..t-1 from inputs
            zero = jnp.zeros(TILE, dtype=jnp.uint32)
            state = [[zero for _ in range(NLIMB)]]
            for w in range(t - 1):
                state.append([in_ref[w, l] for l in range(NLIMB)])
            return state

        def const_limbs(ref, r, w):
            return [ref[r, w, l] for l in range(NLIMB)]

        def m_limbs(i, j):
            return [m_ref[i, j, l] for l in range(NLIMB)]

        def mix(state):
            outs = []
            for i in range(t):
                cols = None
                for j in range(t):
                    pc = _mul_cols(m_limbs(i, j), state[j])
                    cols = pc if cols is None else _add_cols(cols, pc)
                outs.append(_reduce(cols, pj, n0))
            return outs

        def flatten(state):
            return tuple(x for wire in state for x in wire)

        def unflatten(flat):
            return [list(flat[w * NLIMB : (w + 1) * NLIMB]) for w in range(t)]

        def full_round(r, flat, cref):
            state = unflatten(flat)
            state = [
                _add_mod(state[w], const_limbs(cref, r, w), pj) for w in range(t)
            ]
            state = [_x5(x, pj, n0) for x in state]
            return flatten(mix(state))

        def partial_round(r, flat):
            state = unflatten(flat)
            state = [
                _add_mod(state[w], const_limbs(cmid_ref, r, w), pj)
                for w in range(t)
            ]
            state[0] = _x5(state[0], pj, n0)
            return flatten(mix(state))

        flat = flatten(load_state())
        flat = jax.lax.fori_loop(
            0, half, lambda r, s: full_round(r, s, cpre_ref), flat)
        flat = jax.lax.fori_loop(0, r_p, partial_round, flat)
        flat = jax.lax.fori_loop(
            0, half, lambda r, s: full_round(r, s, cpost_ref), flat)

        state = unflatten(flat)
        for l in range(NLIMB):
            out_ref[l] = state[0][l]

    return kernel


@functools.partial(jax.jit, static_argnums=(1,))
def _hash_tiles(inputs: jnp.ndarray, t: int) -> jnp.ndarray:
    """inputs: uint32[nblocks, t-1, 16, 8, 128] -> out uint32[nblocks, 16, 8, 128]."""
    c_pre, c_mid, c_post, m = (jnp.asarray(x) for x in _mont_tables(t))
    nblocks = inputs.shape[0]
    kernel = _make_kernel(t)
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c_pre (half, t, 16)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c_mid (r_p, t, 16)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c_post
            pl.BlockSpec(memory_space=pltpu.VMEM),  # m (t, t, 16)
            pl.BlockSpec((1, t - 1, NLIMB) + TILE,
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NLIMB) + TILE, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel_wrap(cpre, cmid, cpost, m_, in_ref, out_ref):
        kernel(cpre, cmid, cpost, m_, in_ref.at[0], out_ref.at[0])

    return pl.pallas_call(
        kernel_wrap,
        out_shape=jax.ShapeDtypeStruct((nblocks, NLIMB) + TILE, jnp.uint32),
        grid_spec=grid_spec,
    )(c_pre, c_mid, c_post, m, inputs)


def _to_tiles(x: jnp.ndarray) -> jnp.ndarray:
    """uint32[B, 16] -> [nb, 16, 8, 128] (B multiple of 1024)."""
    B = x.shape[0]
    nb = B // TILE_N
    return x.reshape(nb, 8, 128, NLIMB).transpose(0, 3, 1, 2)


def _from_tiles(x: jnp.ndarray) -> jnp.ndarray:
    nb = x.shape[0]
    return x.transpose(0, 2, 3, 1).reshape(nb * TILE_N, NLIMB)


def hash2_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Poseidon hash2 via the Pallas kernel.

    a, b: uint32[B, 16] Montgomery; B must be a multiple of 1024.
    """
    ta, tb = _to_tiles(a), _to_tiles(b)
    tiles = jnp.stack([ta, tb], axis=1)  # (nb, 2, 16, 8, 128)
    out = _hash_tiles(tiles, 3)
    return _from_tiles(out)


def hash4_pallas(a, b, c, d):
    tiles = jnp.stack([_to_tiles(x) for x in (a, b, c, d)], axis=1)
    return _from_tiles(_hash_tiles(tiles, 5))
