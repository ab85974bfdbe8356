#!/usr/bin/env python3
"""Isolated timing of the MSM prefix-scan kernel (the O(N) bulk).

Runs ONLY the mixed-add prefix `pallas_call`, R times CHAINED inside one
jit (each repetition's input is perturbed by the previous output, so the
executions serialize and nothing can be cached or elided), at two rep
counts — the per-step cost comes from (t(R2) - t(R1)) / ((R2-R1)*k),
which cancels both the ~30 ms axon dispatch overhead and its variance.

Usage: python scripts/prefix_prof.py [variant ...]
  variants: limb16 | limb15c (classic reduce) | limb15d (deferred reduce)
"""

import functools
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_zkpool.utils import enable_compile_cache

enable_compile_cache()

from tpu_zkpool.curve.weierstrass import G1
from tpu_zkpool.curve import limb15 as l15
from tpu_zkpool import native_bridge
from tpu_zkpool.msm import grid as mg

K = 512
R_BIG, R_SMALL = 6, 1
LANES = 1024


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def run(rows, k, variant, reps):
    # variant is a static arg so each flavor traces (and Mosaic-compiles)
    # its own kernel even though DEFERRED_REDUCE is module state.
    l15.DEFERRED_REDUCE = variant == "limb15d"
    tiles = mg._sorted_to_scan_tiles(rows, k, LANES)
    acc = jnp.uint32(0)
    for _ in range(reps):
        # flip a low bit of one Y-limb plane with the previous result:
        # serializes the chain; the add kernels run identically on any
        # bit pattern (no data-dependent control flow).
        t = tiles.at[:, 1, :, 0].set(tiles[:, 1, :, 0] ^ (acc & 1))
        out = mg._prefix_tiles(t, mixed=True, complete=False,
                               limb15=variant != "limb16")
        acc = acc + jnp.sum(out[-1], dtype=jnp.uint32)
    return acc


def timed(rows, variant, reps, iters=3):
    int(jax.device_get(run(rows, K, variant, reps)))   # compile + warm
    times = []
    for i in range(iters):
        r2 = rows.at[0, 0, 0, 0].set(rows[0, 0, 0, 0] ^ (i + 1))
        t0 = time.time()
        int(jax.device_get(run(r2, K, variant, reps)))
        times.append(time.time() - t0)
    return min(times)


def main():
    which = sys.argv[1:] or ["limb16", "limb15c", "limb15d"]
    n = K * LANES
    rng = random.Random(11)
    t0 = time.time()
    aff = native_bridge.g1_gen_mul_batch(
        [rng.randrange(1, 1 << 62) for _ in range(n)])
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    rows = jnp.stack([X, Y], axis=1)[:, :, None, :]   # affine (X, Y)
    print(f"setup {time.time()-t0:.1f}s  ({n} points)", flush=True)

    for name in which:
        tb = timed(rows, name, R_BIG)
        ts = timed(rows, name, R_SMALL)
        per_step = (tb - ts) / ((R_BIG - R_SMALL) * K)
        print(f"{name:8s} t(R={R_BIG})={tb*1e3:7.2f}ms  t(R={R_SMALL})="
              f"{ts*1e3:7.2f}ms  -> {per_step*1e6:7.2f} us/step"
              f"  ({LANES/per_step/1e6:,.1f}M adds/s)", flush=True)


if __name__ == "__main__":
    main()
