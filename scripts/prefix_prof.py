#!/usr/bin/env python3
"""Isolated timing of the MSM prefix-scan kernel (the O(N) bulk).

Runs ONLY the mixed-add prefix `pallas_call` (no sort/gather/bucket glue)
at two grid depths and solves t(k) = a + b*k for the per-step cost b —
the ~30 ms axon dispatch overhead and pipeline prologue land in `a`.

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

K_BIG, K_SMALL = 512, 32
LANES = 1024


@functools.partial(jax.jit, static_argnums=(1, 2))
def run(rows, k, variant):
    # variant is a static arg so each flavor traces (and Mosaic-compiles)
    # its own kernel even though DEFERRED_REDUCE is module state.
    l15.DEFERRED_REDUCE = variant == "limb15d"
    tiles = mg._sorted_to_scan_tiles(rows, k, LANES)
    out = mg._prefix_tiles(tiles, mixed=True, complete=False,
                           limb15=variant != "limb16")
    return jnp.sum(out[-1], dtype=jnp.uint32)


def bench(rows_all, k, variant, iters=5):
    n = k * LANES
    variants = [rows_all[i * LANES: i * LANES + n] for i in range(2)]
    int(jax.device_get(run(variants[0], k, variant)))   # compile + warm
    times = []
    for i in range(iters):
        t0 = time.time()
        int(jax.device_get(run(variants[i % 2], k, variant)))
        times.append(time.time() - t0)
    return min(times)


def main():
    which = sys.argv[1:] or ["limb16", "limb15c", "limb15d"]
    n = K_BIG * LANES + 2 * LANES
    rng = random.Random(11)
    t0 = time.time()
    aff = native_bridge.g1_gen_mul_batch(
        [rng.randrange(1, 1 << 62) for _ in range(n)])
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    rows_all = jnp.stack([X, Y], axis=1)[:, :, None, :]   # affine (X, Y)
    print(f"setup {time.time()-t0:.1f}s  ({n} points)", flush=True)

    for name in which:
        tb = bench(rows_all, K_BIG, name)
        ts = bench(rows_all, K_SMALL, name)
        per_step = (tb - ts) / (K_BIG - K_SMALL)
        print(f"{name:8s} t({K_BIG})={tb*1e3:7.2f}ms  t({K_SMALL})="
              f"{ts*1e3:7.2f}ms  -> {per_step*1e6:7.2f} us/step"
              f"  ({LANES/per_step/1e6:,.1f}M adds/s)", flush=True)


if __name__ == "__main__":
    main()
