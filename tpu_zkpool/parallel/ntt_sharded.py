"""Coefficient-axis-sharded negacyclic NTT over the device mesh.

The "sequence-parallel" dimension of this framework (SURVEY.md §5): the
RLWE ring axis (and the Groth16 evaluation domain) is sharded over D
devices. A DIF butterfly stage with half-block h pairs element i with
i + h; while h >= n/D the partner lives on another device, so those
log2(D) stages run as a pairwise shard exchange over ICI
(``jax.lax.ppermute`` — the XLA collective form of the
``make_async_remote_copy`` ring pattern), each followed by purely local
element-wise butterfly math. The remaining stages fit inside a shard and
reuse the single-chip twiddle slices. The inverse (DIT) is symmetric with
the exchanges in its LAST log2(D) stages.

Bit-exact with ``rlwe/ntt.py`` (same tables, same orderings); the spectrum
stays sharded, so a full sharded negacyclic multiply does
2 * log2(D) shard exchanges and one final untwist without ever gathering
the coefficient axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from tpu_zkpool.fields import rlweq
from tpu_zkpool.fields.rlweq import R2_MOD_Q
from tpu_zkpool.rlwe.ntt import _tables


def _local_slices(n: int, D: int):
    """Per-device twiddle tables: (twist, untwist) as (D, n/D) arrays and
    the fwd/inv stage tables split into (cross, local) parts."""
    twist, untwist, fwd, inv = _tables(n)
    S = n // D
    return (twist.reshape(D, S), untwist.reshape(D, S), fwd, inv)


def _forward_traced(x, mesh, axis: str = "sp", exchange: str = "ppermute",
                    interpret: bool = False):
    n = x.shape[-1]
    D = mesh.shape[axis]
    S = n // D
    assert S * D == n and S >= 2
    twist, _, fwd, _ = _local_slices(n, D)
    n_cross = (D - 1).bit_length()      # stages with h >= S
    batch_spec = (None,) * (x.ndim - 1)

    def local(xl):
        d = jax.lax.axis_index(axis)
        y = rlweq.mont_mul(xl, jnp.asarray(twist)[d])
        # cross-device stages: h = n/2, n/4, ..., S
        for st in range(n_cross):
            h = n >> (st + 1)
            hd = h // S
            u_side = (d // hd) % 2 == 0
            # twiddle for the v-side output at local j: w^(step*((d mod hd)*S+j))
            tw_full = jnp.asarray(fwd[st])           # (h,)
            base = (d % hd) * S
            tw = jax.lax.dynamic_slice_in_dim(tw_full, base, S)
            if exchange == "rdma":
                from tpu_zkpool.parallel import ntt_rdma
                B = 1
                for dim in y.shape[:-1]:
                    B *= dim
                out = ntt_rdma.exchange_butterfly_rdma(
                    y.reshape(B, S), tw, u_side, d ^ hd,
                    interpret=interpret)
                y = out.reshape(y.shape)
                continue
            partner = [(s, s ^ hd) for s in range(D)]
            other = jax.lax.ppermute(y, axis, partner)
            s_out = rlweq.add(y, other)              # u-side output
            d_out = rlweq.mont_mul(rlweq.sub(other, y), tw)  # v-side output
            y = jnp.where(u_side, s_out, d_out)
        # local stages: h < S
        for st in range(n_cross, len(fwd)):
            tw = jnp.asarray(fwd[st])
            h = tw.shape[0]
            blocks = y.reshape(y.shape[:-1] + (S // (2 * h), 2 * h))
            u = blocks[..., :h]
            v = blocks[..., h:]
            s = rlweq.add(u, v)
            dd = rlweq.mont_mul(rlweq.sub(u, v), tw)
            y = jnp.concatenate([s, dd], axis=-1).reshape(y.shape)
        return y

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(*batch_spec, axis), out_specs=P(*batch_spec, axis),
        check_vma=False,
    )(x)


def _inverse_traced(y, mesh, axis: str = "sp", exchange: str = "ppermute",
                    interpret: bool = False):
    n = y.shape[-1]
    D = mesh.shape[axis]
    S = n // D
    _, untwist, _, inv = _local_slices(n, D)
    n_cross = (D - 1).bit_length()
    n_local = len(inv) - n_cross
    batch_spec = (None,) * (y.ndim - 1)

    def local(yl):
        d = jax.lax.axis_index(axis)
        x = yl
        # local stages first: h = 1 .. S/2
        for st in range(n_local):
            tw = jnp.asarray(inv[st])
            h = tw.shape[0]
            blocks = x.reshape(x.shape[:-1] + (S // (2 * h), 2 * h))
            u = blocks[..., :h]
            v = rlweq.mont_mul(blocks[..., h:], tw)
            x = jnp.concatenate(
                [rlweq.add(u, v), rlweq.sub(u, v)], axis=-1).reshape(x.shape)
        # cross-device stages: h = S, 2S, ..., n/2
        for st in range(n_local, len(inv)):
            h = 1 << st
            hd = h // S
            tw_full = jnp.asarray(inv[st])           # (h,)
            base = (d % hd) * S
            tw = jax.lax.dynamic_slice_in_dim(tw_full, base, S)
            u_side = (d // hd) % 2 == 0
            # v-side scales its shard by the twiddle BEFORE the exchange
            mine = jnp.where(u_side, x, rlweq.mont_mul(x, tw))
            if exchange == "rdma":
                # same kernel as forward with tw = Montgomery one, so the
                # v-side multiply is the identity: out = u ? m+o : o-m
                from tpu_zkpool.parallel import ntt_rdma
                B = 1
                for dim in mine.shape[:-1]:
                    B *= dim
                one = jnp.full((S,), np.uint32(rlweq.R_MOD_Q),
                               dtype=jnp.uint32)
                out = ntt_rdma.exchange_butterfly_rdma(
                    mine.reshape(B, S), one, u_side, d ^ hd,
                    interpret=interpret)
                x = out.reshape(mine.shape)
                continue
            partner = [(s, s ^ hd) for s in range(D)]
            other = jax.lax.ppermute(mine, axis, partner)
            x = jnp.where(u_side, rlweq.add(mine, other),
                          rlweq.sub(other, mine))
        return rlweq.mont_mul(x, jnp.asarray(untwist)[d])

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(*batch_spec, axis), out_specs=P(*batch_spec, axis),
        check_vma=False,
    )(y)


# ---------------------------------------------------------------------------
# Public entry points: one jitted program per (mesh, axis) — eager shard_map
# executes the body primitive-by-primitive (thousands of tiny GSPMD
# compiles none of which persist in the compile cache); jit compiles the
# whole transform once. jit retraces per input shape as usual.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fwd_fn(mesh, axis: str, exchange: str, interpret: bool):
    return jax.jit(
        lambda x: _forward_traced(x, mesh, axis, exchange, interpret))


@functools.lru_cache(maxsize=None)
def _inv_fn(mesh, axis: str, exchange: str, interpret: bool):
    return jax.jit(
        lambda y: _inverse_traced(y, mesh, axis, exchange, interpret))


@functools.lru_cache(maxsize=None)
def _mul_fn(mesh, axis: str, exchange: str, interpret: bool):
    def run(a, b):
        fa = _forward_traced(a, mesh, axis, exchange, interpret)
        fb = _forward_traced(b, mesh, axis, exchange, interpret)
        prod = rlweq.mont_mul(fa, fb)
        prod = rlweq.mont_mul(prod, jnp.asarray(np.uint32(R2_MOD_Q)))
        return _inverse_traced(prod, mesh, axis, exchange, interpret)

    return jax.jit(run)


def forward_sharded(x, mesh, axis: str = "sp", exchange: str = "ppermute",
                    interpret: bool = False):
    """Negacyclic forward NTT with the last axis sharded over ``axis``.

    x: uint32[..., n] (< q) sharded on the final axis. Returns the
    bit-reversed-order spectrum, still sharded. ``exchange="rdma"``
    swaps the cross-device stages' ppermute for the double-buffered
    Pallas remote-copy kernel (ntt_rdma.py; TPU, or interpret=True).
    """
    return _fwd_fn(mesh, axis, exchange, interpret)(x)


def inverse_sharded(y, mesh, axis: str = "sp", exchange: str = "ppermute",
                    interpret: bool = False):
    """Inverse of :func:`forward_sharded` (sharded in, sharded out)."""
    return _inv_fn(mesh, axis, exchange, interpret)(y)


def negacyclic_mul_sharded(a, b, mesh, axis: str = "sp",
                           exchange: str = "ppermute",
                           interpret: bool = False):
    """Sharded negacyclic polynomial product: coefficient axis stays
    sharded end-to-end (2 log2(D) exchanges per transform), as ONE
    jitted program."""
    return _mul_fn(mesh, axis, exchange, interpret)(a, b)
