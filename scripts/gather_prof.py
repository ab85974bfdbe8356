#!/usr/bin/env python3
"""Microbenchmark: XLA:TPU row-gather throughput vs row width.

The MSM profile attributes ~60% of device time to the per-window point
gather (jnp.take of (N, w)-uint32 rows by a random permutation). This
sweep measures ns/row for several row widths and layouts to find the
fastest data layout for the sorted-point stream:

  rows_w    : take of (N, w) uint32 rows (row-contiguous copy)
  planes_w  : take of (w, N) along axis=1 (pure element gather, control)

Chained-reps inside one jit cancel the ~30 ms axon dispatch constant
(same methodology as prefix_prof.py).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_zkpool.utils import enable_compile_cache
enable_compile_cache()

N = 1 << 17
R_BIG, R_SMALL = 9, 1


@functools.partial(jax.jit, static_argnums=(2, 3))
def run_rows(src, idx, reps, axis):
    acc = jnp.uint32(0)
    for _ in range(reps):
        i = (idx + acc) % jnp.uint32(src.shape[axis])
        out = jnp.take(src, i, axis=axis)
        acc = acc + (jnp.sum(out[-1] if axis == 0 else out[:, -1],
                             dtype=jnp.uint32) & jnp.uint32(1))
    return acc


def timed(src, idx, axis, iters=3):
    int(jax.device_get(run_rows(src, idx, R_BIG, axis)))
    int(jax.device_get(run_rows(src, idx, R_SMALL, axis)))
    best = None
    for i in range(iters):
        idx2 = (idx + np.uint32(i + 1)) % np.uint32(src.shape[axis])
        t0 = time.time()
        int(jax.device_get(run_rows(src, jnp.asarray(idx2), R_BIG, axis)))
        tb = time.time() - t0
        t0 = time.time()
        int(jax.device_get(run_rows(src, jnp.asarray(idx2), R_SMALL, axis)))
        ts = time.time() - t0
        per = (tb - ts) / ((R_BIG - R_SMALL) * N)
        best = per if best is None else min(best, per)
    return best


def main():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.permutation(N).astype(np.uint32))
    for w in (8, 16, 32, 64):
        src = jnp.asarray(rng.randint(0, 1 << 30, size=(N, w), dtype=np.int64)
                          .astype(np.uint32))
        per = timed(src, idx, 0)
        print(f"rows w={w:4d} srcN=2^17: {per*1e9:8.2f} ns/row "
              f"({w*4/per/1e9:6.1f} GB/s)", flush=True)
    # source-size sweep at the MSM's row width: does ns/row grow with the
    # gathered table's footprint (DRAM row-buffer / address locality)?
    for lg in (14, 18, 20, 21):
        m = 1 << lg
        src = jnp.asarray(rng.randint(0, 1 << 30, size=(m, 32),
                                      dtype=np.int64).astype(np.uint32))
        i2 = jnp.asarray((rng.permutation(max(m, N))[:N] % m)
                         .astype(np.uint32))
        per = timed(src, i2, 0)
        print(f"rows w=  32 srcN=2^{lg}: {per*1e9:8.2f} ns/row "
              f"({32*4/per/1e9:6.1f} GB/s)", flush=True)
    src = jnp.asarray(rng.randint(0, 1 << 30, size=(32, N), dtype=np.int64)
                      .astype(np.uint32))
    per = timed(src, idx, 1)
    print(f"planes w=32 (axis=1): {per*1e9:8.2f} ns/row "
          f"({32*4/per/1e9:6.1f} GB/s)", flush=True)

    # --- MSM consumer patterns: does the downstream scan-tile transpose
    # slow the gather itself (layout assignment), barrier or not? ---
    from tpu_zkpool.msm import grid as mg

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def run_tiles(src4, idx, reps, barrier):
        acc = jnp.uint32(0)
        k = src4.shape[0] // 1024
        for _ in range(reps):
            i = (idx + acc) % jnp.uint32(src4.shape[0])
            out = jnp.take(src4, i, axis=0)
            if barrier:
                out = jax.lax.optimization_barrier(out)
            tiles = mg._sorted_to_scan_tiles(out, k)
            acc = acc + (jnp.sum(tiles[-1], dtype=jnp.uint32)
                         & jnp.uint32(1))
        return acc

    src4 = jnp.asarray(rng.randint(0, 1 << 30, size=(N, 2, 1, 16),
                                   dtype=np.int64).astype(np.uint32))
    for barrier in (False, True):
        int(jax.device_get(run_tiles(src4, idx, R_BIG, barrier)))
        int(jax.device_get(run_tiles(src4, idx, R_SMALL, barrier)))
        best = None
        for i in range(3):
            idx2 = jnp.asarray((np.asarray(idx) + np.uint32(i + 1)) % N)
            t0 = time.time()
            int(jax.device_get(run_tiles(src4, idx2, R_BIG, barrier)))
            tb = time.time() - t0
            t0 = time.time()
            int(jax.device_get(run_tiles(src4, idx2, R_SMALL, barrier)))
            ts = time.time() - t0
            per = (tb - ts) / ((R_BIG - R_SMALL) * N)
            best = per if best is None else min(best, per)
        print(f"take+scan_tiles barrier={barrier!s:5s}: {best*1e9:8.2f} "
              f"ns/row ({32*4/best/1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
