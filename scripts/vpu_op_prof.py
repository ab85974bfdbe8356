#!/usr/bin/env python3
"""Micro-benchmark: relative throughput of uint32 VPU ops on the real TPU.

Informs the MSM limb-math rewrite (docs/PLAN.md "Known gaps" #4): if
uint32 multiply is emulated (multi-op) on the VPU, the win is cutting
multiply COUNT (Karatsuba limbs); if mul ~ add, the win is grouping
lo/hi split overhead (15-bit limb accumulation).

Each kernel runs G grid steps; a step applies OPS independent ops across
NSTREAM register streams of (8, 128) uint32, chained across steps so no
step can be elided. Reports ns per (8,128)-op per step and the ratio to
the add baseline.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_zkpool.utils import enable_compile_cache

enable_compile_cache()

NSTREAM = 8          # independent dependency chains (hide latency)
OPS = 96             # ops per stream per grid step
G = 512              # grid steps


def make_kernel(op):
    def kernel(in_ref, out_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = in_ref[...]

        xs = [acc_ref[s] for s in range(NSTREAM)]
        c = in_ref[0]
        for _ in range(OPS):
            xs = [op(x, c) for x in xs]
        for s in range(NSTREAM):
            acc_ref[s] = xs[s]

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return kernel


OPSETS = {
    "add": lambda x, c: x + c,
    "mul": lambda x, c: x * c,
    "mul16": lambda x, c: (x & jnp.uint32(0xFFFF)) * (c & jnp.uint32(0xFFFF)),
    "and": lambda x, c: (x & c) + jnp.uint32(1),
    "shr": lambda x, c: (x >> jnp.uint32(16)) + c,
    "mulhi_via_shift": lambda x, c: ((x * c) >> jnp.uint32(16)) + x,
    "select": lambda x, c: jnp.where(x > c, x, c) + jnp.uint32(1),
}


@functools.partial(jax.jit, static_argnums=(1,))
def run(x, name):
    spec = pl.BlockSpec((NSTREAM, 8, 128), lambda j: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        make_kernel(OPSETS[name]),
        grid=(G,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NSTREAM, 8, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((NSTREAM, 8, 128), jnp.uint32)],
    )(x)
    return jnp.sum(out, dtype=jnp.uint32)


def main():
    rng = np.random.default_rng(0)
    results = {}
    for name in OPSETS:
        x = jnp.asarray(rng.integers(1, 1 << 31, (NSTREAM, 8, 128),
                                     dtype=np.uint32))
        int(jax.device_get(run(x, name)))  # compile + warm
        times = []
        for i in range(5):
            x2 = jnp.asarray(rng.integers(1, 1 << 31, (NSTREAM, 8, 128),
                                          dtype=np.uint32))
            t0 = time.time()
            int(jax.device_get(run(x2, name)))
            times.append(time.time() - t0)
        dt = min(times)
        per_op = dt / (G * OPS * NSTREAM)
        results[name] = per_op
        print(f"{name:16s} {dt*1e3:8.3f} ms  {per_op*1e9:8.2f} ns/(8,128)-op"
              f"  ratio_vs_add={per_op/results.get('add', per_op):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
