#!/usr/bin/env python3
"""Headline benchmark: Poseidon hashes/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the BASELINE.md target of 1e6 Poseidon hashes/s/chip (the
reference itself publishes no measured numbers — SURVEY.md §6).

Measurement notes for this environment (axon-tunneled TPU):
- ``block_until_ready`` does not block on actual remote execution; a
  device_get of a reduced scalar forces the full round trip.
- Inputs are generated on-device and the hash is CHAINED (output feeds the
  next iteration) so no transfer or caching can short-circuit the work.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_zkpool.utils import enable_compile_cache

enable_compile_cache()

from tpu_zkpool.hash import poseidon_pallas

BASELINE_HASHES_PER_S = 1_000_000.0


@functools.partial(jax.jit, static_argnums=(1, 2))
def _chain(seed, batch, iters):
    key = jax.random.PRNGKey(seed)
    x = jax.random.randint(key, (batch, 16), 0, 1 << 16, dtype=jnp.int32).astype(
        jnp.uint32
    )
    def body(s, _):
        return poseidon_pallas.hash2_pallas(s, s), None
    out, _ = jax.lax.scan(body, x, None, length=iters)
    return jnp.sum(out, dtype=jnp.uint32)


def _timed(seed, batch, iters):
    t0 = time.time()
    v = int(jax.device_get(_chain(seed, batch, iters)))
    return time.time() - t0, v


def main():
    batch, iters = 1 << 15, 4
    _timed(0, batch, iters)  # compile + warm
    times = [_timed(s, batch, iters)[0] for s in range(1, 4)]
    best = min(times)
    rate = batch * iters / best
    print(json.dumps({
        "metric": "poseidon_hashes_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "hashes/s",
        "vs_baseline": round(rate / BASELINE_HASHES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
