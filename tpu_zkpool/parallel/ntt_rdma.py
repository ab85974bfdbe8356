"""Double-buffered Pallas-RDMA shard exchange for cross-device NTT stages.

The ppermute path in ``ntt_sharded.py`` serializes each cross-device DIF
butterfly stage: the whole shard crosses ICI, THEN the butterfly math
runs. This module implements the SNIPPETS.md [2] / SURVEY.md §5 pattern
instead: the batch axis is cut into chunks, and chunk *i*'s butterfly
compute overlaps chunk *i+1*'s ``pltpu.make_async_remote_copy`` transfer,
with two receive slots (double buffering) and explicit semaphore flow
control so a sender can never overwrite a slot the receiver is still
reading.

One kernel covers both transform directions (the stage math of
``ntt_sharded._forward_traced`` / ``_inverse_traced``):

    out = u_side ? (y + other) : (other - y) * tw      (mod q, Montgomery)

- forward stage: ``tw`` = the stage twiddle slice,
- inverse stage: the v-side pre-scales its shard by the twiddle BEFORE the
  exchange (done by the caller), and ``tw`` = Montgomery one, making the
  multiply the identity.

Protocol per grid step i (C chunks, both partners run it in lockstep):
  i == 0   : neighbor barrier, then send chunk 0 -> partner slot 0
  i+1 < C  : (flow-control wait if i+1 >= 2) send chunk i+1 -> slot (i+1)&1
  always   : wait recv slot i&1; butterfly-combine chunk i; signal the
             partner's flow semaphore (only while a sender still needs it)
  i == C-1 : drain outstanding send semaphores

The exchange is PAIRWISE (partner = my_index ^ hd — the butterfly
communication pattern), not a ring; self-exchange (partner == me) is valid
and exercises the full DMA/semaphore path on a single chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_zkpool.fields import rlweq

# Sublane/lane tile for uint32 on TPU; shards not meeting this fall back
# to the ppermute path (ntt_sharded picks the backend).
MIN_B, MIN_S = 8, 128


def _butterfly(y, other, tw, u_side):
    s_out = rlweq.add(y, other)
    d_out = rlweq.mont_mul(rlweq.sub(other, y), tw)
    return jnp.where(u_side != 0, s_out, d_out)


def _kernel(c_chunks: int, bc: int, remote_sems: bool,
            s_ref, yb_ref, yany_ref, tw_ref, out_ref,
            recv_buf, send_sem, recv_sem, flow_sem):
    i = pl.program_id(0)
    partner = s_ref[0]
    u_side = s_ref[1]
    slot = lax.rem(i, 2)

    def send_op(chunk, sl):
        return pltpu.make_async_remote_copy(
            src_ref=yany_ref.at[pl.ds(chunk * bc, bc)],
            dst_ref=recv_buf.at[sl],
            send_sem=send_sem.at[sl],
            recv_sem=recv_sem.at[sl],
            device_id=partner,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    @pl.when(i == 0)
    def _():
        if remote_sems:
            # Neighbor barrier: my remote writes must not race the
            # partner's kernel entry (its recv buffer/semaphores must be
            # live).
            barrier = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(barrier, inc=1, device_id=partner,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, 1)
        send_op(i, slot).start()

    @pl.when(i + 1 < c_chunks)
    def _():
        nslot = lax.rem(i + 1, 2)

        @pl.when(i + 1 >= 2)
        def _():
            if remote_sems:
                # flow control: partner finished reading slot nslot's
                # previous occupant (chunk i-1's compute on its side)
                pltpu.semaphore_wait(flow_sem, 1)
            # and my previous send on this slot (chunk i-1) completed
            send_op(i - 1, nslot).wait_send()

        send_op(i + 1, nslot).start()

    # await the partner's chunk i, then combine
    send_op(i, slot).wait_recv()
    out_ref[:] = _butterfly(yb_ref[:], recv_buf[slot], tw_ref[:], u_side)

    if remote_sems:
        @pl.when(i + 3 <= c_chunks)
        def _():
            # unblock the partner's send of chunk i+2 into slot i&1
            pltpu.semaphore_signal(flow_sem, inc=1, device_id=partner,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)

    @pl.when(i == c_chunks - 1)
    def _():
        # drain: the last two sends' completion semaphores
        send_op(i, slot).wait_send()

        @pl.when(jnp.logical_and(i >= 1, c_chunks >= 2))
        def _():
            send_op(i - 1, lax.rem(i + 1, 2)).wait_send()


def exchange_butterfly_rdma(y, tw, u_side, partner, *, chunk: int = 8,
                            interpret: bool = False, collective_id: int = 7):
    """One cross-device butterfly stage with an overlapped RDMA exchange.

    y: uint32[B, S] local shard (inside shard_map); tw: uint32[S] stage
    twiddles (Montgomery one for inverse stages); u_side: traced bool-ish
    scalar; partner: traced int32 logical device index along the mesh
    axis. Returns uint32[B, S].
    """
    B, S = y.shape
    assert B % MIN_B == 0 and S % MIN_S == 0, (B, S)
    bc = max(MIN_B, min(B, chunk))
    while B % bc:
        bc //= 2
    c_chunks = B // bc
    scalars = jnp.stack([partner.astype(jnp.int32),
                         u_side.astype(jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_chunks,),
        in_specs=[
            pl.BlockSpec((bc, S), lambda i, *_: (i, 0)),   # compute chunk
            pl.BlockSpec(memory_space=pl.ANY),          # RDMA source
            pl.BlockSpec((1, S), lambda i, *_: (0, 0)),    # twiddles
        ],
        out_specs=pl.BlockSpec((bc, S), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bc, S), jnp.uint32),            # recv slots
            pltpu.SemaphoreType.DMA((2,)),                 # send per slot
            pltpu.SemaphoreType.DMA((2,)),                 # recv per slot
            pltpu.SemaphoreType.REGULAR,                   # flow control
        ],
    )
    # Interpret mode (CPU virtual mesh) discharges each DMA synchronously
    # and does not implement REMOTE semaphore signals — the barrier and
    # flow-control handshakes are compiled out there; the real-TPU build
    # keeps the full protocol.
    return pl.pallas_call(
        functools.partial(_kernel, c_chunks, bc, not interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
        interpret=interpret,
    )(scalars, y, y, tw[None])
