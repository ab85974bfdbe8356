#!/usr/bin/env python3
"""Drive the compiled RDMA butterfly-exchange kernel on the real TPU.

Single-chip validation of ntt_rdma.exchange_butterfly_rdma: with
partner == my own index the remote copy is a self-DMA, which exercises the
FULL compiled protocol — barrier semaphore, double-buffered send/recv
slots, flow-control semaphore, drain — on real hardware (the virtual-mesh
test can only run interpret mode, which compiles the remote semaphores
out). Both u-side and v-side butterfly math are checked against the XLA
formula with other == y.

Usage: python scripts/ntt_rdma_check.py [B] [S]
"""

import sys
import random

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.utils import enable_compile_cache

enable_compile_cache()

from tpu_zkpool.fields import rlweq
from tpu_zkpool.parallel import ntt_rdma


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = random.Random(13)
    y = np.array([[rng.randrange(rlweq.Q) for _ in range(S)]
                  for _ in range(B)], dtype=np.uint32)
    tw = np.array([rng.randrange(rlweq.Q) for _ in range(S)],
                  dtype=np.uint32)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("sp",))

    def body(yl):
        d = jax.lax.axis_index("sp")
        outs = []
        for u in (1, 0):
            outs.append(ntt_rdma.exchange_butterfly_rdma(
                yl, jnp.asarray(tw), jnp.uint32(u), d))   # partner = self
        return tuple(outs)

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=jax.sharding.PartitionSpec(),
        out_specs=jax.sharding.PartitionSpec(), check_vma=False))
    got_u, got_v = (np.asarray(o) for o in jax.device_get(f(jnp.asarray(y))))
    yj = jnp.asarray(y)
    exp_u = np.asarray(rlweq.add(yj, yj))
    exp_v = np.asarray(rlweq.mont_mul(rlweq.sub(yj, yj), jnp.asarray(tw)))
    assert (got_u == exp_u).all(), "u-side self-exchange mismatch"
    assert (got_v == exp_v).all(), "v-side self-exchange mismatch"
    print(f"ntt_rdma self-exchange OK on {jax.devices()[0]} "
          f"(B={B}, S={S}, chunks={B // min(B, 8)})")


if __name__ == "__main__":
    main()
