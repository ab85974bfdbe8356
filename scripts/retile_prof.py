#!/usr/bin/env python3
"""Prototype: in-kernel retile of row-major point rows to limb planes.

The MSM glue wall is the XLA scan-tile transpose (22 ns/row measured by
gather_prof.py even behind a barrier). This probes whether a Pallas kernel
can consume ROW-MAJOR gathered rows via strided BlockSpec blocks and do
the (1024, w) -> (w, 8, 128) limb-plane conversion in VMEM:

  t0: control — kernel reads the pre-tiled layout (today's path, no work)
  t1: jnp.transpose of the (1024, w) block in-kernel
  t2: per-limb column extraction T[:, l] -> (8, 128)

Per-step cost via chained reps (cancels dispatch overhead).

Usage: python scripts/retile_prof.py [variants...]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_zkpool.utils import enable_compile_cache
enable_compile_cache()

K = 128          # grid steps
W = 32           # words per row (2 coords x 16 limbs)
LANES = 1024
R_BIG, R_SMALL = 9, 1


def make_kernel(variant):
    def kernel(in_ref, out_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

        if variant == "t0":                      # pre-tiled control
            planes = [in_ref[0, w] for w in range(W)]
        elif variant == "t1":                    # one in-VMEM transpose
            T = in_ref[0]                        # (1024, W)
            TT = jnp.transpose(T)                # (W, 1024)
            planes = [TT[w].reshape(8, 128) for w in range(W)]
        else:                                    # t2: per-column extract
            T = in_ref[0]
            planes = [T[:, w].reshape(8, 128) for w in range(W)]
        for w in range(W):
            acc_ref[w] = acc_ref[w] ^ planes[w]

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return kernel


def build(variant):
    if variant == "t0":
        in_spec = pl.BlockSpec((1, W, 8, 128), lambda j: (j, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        shape_in = (K, W, 8, 128)
    else:
        in_spec = pl.BlockSpec((1, LANES, W), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM)
        shape_in = (K, LANES, W)

    def run_once(x):
        return pl.pallas_call(
            make_kernel(variant),
            grid=(K,),
            in_specs=[in_spec],
            out_specs=pl.BlockSpec((W, 8, 128), lambda j: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, 8, 128), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((W, 8, 128), jnp.uint32)],
        )(x)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x, reps):
        acc = jnp.uint32(0)
        for _ in range(reps):
            x = x.at[tuple(0 for _ in shape_in)].set(
                x[tuple(0 for _ in shape_in)] ^ acc)
            out = run_once(x)
            acc = acc + (jnp.sum(out, dtype=jnp.uint32) & jnp.uint32(1))
        return acc

    return run, shape_in


def main():
    which = sys.argv[1:] or ["t0", "t1", "t2"]
    rng = np.random.RandomState(0)
    for variant in which:
        try:
            run, shape_in = build(variant)
            x = jnp.asarray(rng.randint(0, 1 << 30, size=shape_in,
                                        dtype=np.int64).astype(np.uint32))
            t0 = time.time()
            int(jax.device_get(run(x, R_BIG)))
            print(f"{variant}: compile+warm {time.time()-t0:.1f}s",
                  flush=True)
            int(jax.device_get(run(x, R_SMALL)))
            best = None
            for i in range(3):
                x2 = x.at[tuple(0 for _ in shape_in)].set(np.uint32(i))
                t0 = time.time()
                int(jax.device_get(run(x2, R_BIG)))
                tb = time.time() - t0
                t0 = time.time()
                int(jax.device_get(run(x2, R_SMALL)))
                ts = time.time() - t0
                per = (tb - ts) / ((R_BIG - R_SMALL) * K)
                best = per if best is None else min(best, per)
            print(f"{variant}: {best*1e6:7.2f} us/step "
                  f"({LANES*W*4/best/1e9:6.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
