#!/usr/bin/env python3
"""Headline benchmark sweep on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Headline = grid-MSM throughput at 2^20 BN254 points (the BASELINE.md
flagship metric); ``extra`` records the full sweep (Poseidon, RLWE
polymuls, batched Groth16 verify, 2^17 MSM). vs_baseline for the MSM is
measured against the repo's own single-core native C++ Pippenger — the
reference's actual prover substrate class (gnark on CPU; the reference
publishes no numbers, SURVEY.md §6).

Measurement notes for this environment (axon-tunneled TPU):
- ``block_until_ready`` does not block on actual remote execution; a
  device_get of a reduced scalar forces the full round trip.
- Inputs vary per timing iteration (chained or reseeded) so no cache can
  short-circuit the work.
"""

import functools
import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_zkpool.utils import enable_compile_cache

enable_compile_cache()

from tpu_zkpool.hash import poseidon_pallas

BASE_POSEIDON = 1_000_000.0          # BASELINE.md target
BASE_MSM_NATIVE = 27_000.0           # native/bn254.cpp single core, pts/s
MSM_LOG2N = 20


# ----------------------------------------------------------------- poseidon

@functools.partial(jax.jit, static_argnums=(1, 2))
def _hash_chain(seed, batch, iters):
    key = jax.random.PRNGKey(seed)
    x = jax.random.randint(key, (batch, 16), 0, 1 << 16,
                           dtype=jnp.int32).astype(jnp.uint32)

    def body(s, _):
        return poseidon_pallas.hash2_pallas(s, s), None

    out, _ = jax.lax.scan(body, x, None, length=iters)
    return jnp.sum(out, dtype=jnp.uint32)


def bench_poseidon():
    batch, iters = 1 << 15, 4
    int(jax.device_get(_hash_chain(0, batch, iters)))  # compile + warm
    times = []
    for s in range(1, 4):
        t0 = time.time()
        int(jax.device_get(_hash_chain(s, batch, iters)))
        times.append(time.time() - t0)
    return batch * iters / min(times)


# --------------------------------------------------------------------- msm

def bench_msm(log2n, c=13, iters=3):
    from tpu_zkpool.curve.weierstrass import G1
    from tpu_zkpool.fields.bn254 import FR_MOD
    from tpu_zkpool.fields.limbs import ints_to_limbs
    from tpu_zkpool import native_bridge
    from tpu_zkpool.msm import grid as mg

    n = 1 << log2n
    rng = random.Random(7)
    base = [rng.randrange(1, 1 << 62) for _ in range(n)]
    aff = native_bridge.g1_gen_mul_batch(base)
    ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])

    # correctness cross-check on the first run
    limbs = jnp.asarray(ints_to_limbs(ks))
    out = mg.msm_grid_g1((X, Y, Z), limbs, c=c, backend="pallas",
                         complete=False)   # prover mode (see grid._finish)
    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in out))
    got = (int(np.asarray(xs).reshape(-1)[0]),
           int(np.asarray(ys).reshape(-1)[0]))
    exp = native_bridge.g1_msm(ks, aff)   # full native oracle (~45 s at 2^20)
    assert got == exp, "TPU MSM != native oracle"

    times = []
    for it in range(iters):
        ks2 = [(k + it + 1) % FR_MOD for k in ks]
        lm = jnp.asarray(ints_to_limbs(ks2))
        t0 = time.time()
        o = mg.msm_grid_g1((X, Y, Z), lm, c=c, backend="pallas",
                           complete=False)
        int(jax.device_get(jnp.sum(o[0])))
        times.append(time.time() - t0)
    return n / min(times)


# -------------------------------------------------------------------- rlwe

def bench_rlwe(batch=4096, iters=3):
    from tpu_zkpool.rlwe import ntt
    from tpu_zkpool.fields.rlweq import Q

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def chain(seed, b, its):
        key = jax.random.PRNGKey(seed)
        a = jax.random.randint(key, (b, 1024), 0, Q,
                               dtype=jnp.int32).astype(jnp.uint32)

        def body(s, _):
            return ntt.negacyclic_mul(s, s), None

        out, _ = jax.lax.scan(body, a, None, length=its)
        return jnp.sum(out, dtype=jnp.uint32)

    int(jax.device_get(chain(0, batch, iters)))
    times = []
    for s in range(1, 4):
        t0 = time.time()
        int(jax.device_get(chain(s, batch, iters)))
        times.append(time.time() - t0)
    return batch * iters / min(times)


# ---------------------------------------------------------- groth16 verify

def bench_verify_batch(B=4):
    from tpu_zkpool.refimpl.groth16_ref import R1CS, setup, prove
    from tpu_zkpool.groth16 import verify_tpu
    from tpu_zkpool.fields.bn254 import FR_MOD as R

    r1cs = R1CS(num_vars=5, num_public=2,
                a_rows=[{2: 1}, {3: 1}, {}],
                b_rows=[{2: 1}, {2: 1}, {0: 1}],
                c_rows=[{3: 1}, {4: 1},
                        {1: 1, 4: -1 % R, 2: -1 % R, 0: -5 % R}])
    pk, vk = setup(r1cs)
    proofs, pubs = [], []
    for x in range(3, 3 + B):
        w = [1, x**3 + x + 5, x, x * x, x**3]
        proofs.append(prove(pk, r1cs, w, seed=x))
        pubs.append([w[1]])
    t0 = time.time()
    ok = verify_tpu.verify_batch(vk, proofs, pubs)
    assert ok.all()
    warm = time.time() - t0
    if warm > 60:          # don't pay a second slow pass; report the warm one
        return B / warm
    t0 = time.time()
    ok = verify_tpu.verify_batch(vk, proofs, pubs)
    dt = time.time() - t0
    return B / min(warm, dt)


def main():
    extra = {}
    try:
        extra["poseidon_hashes_per_s"] = round(bench_poseidon(), 1)
    except Exception as e:  # pragma: no cover
        extra["poseidon_error"] = str(e)[:200]
    try:
        extra["rlwe_polymul_1024_per_s"] = round(bench_rlwe(), 1)
    except Exception as e:
        extra["rlwe_error"] = str(e)[:200]
    try:
        extra["msm_g1_2e17_pts_per_s"] = round(bench_msm(17), 1)
    except Exception as e:
        extra["msm17_error"] = str(e)[:200]
    try:
        extra["groth16_verify_batch_per_s"] = round(bench_verify_batch(), 2)
    except Exception as e:
        extra["verify_error"] = str(e)[:200]

    try:
        msm20 = bench_msm(MSM_LOG2N)
    except Exception as e:
        msm20 = None
        extra["msm20_error"] = str(e)[:200]

    if msm20 is not None:
        print(json.dumps({
            "metric": f"msm_g1_2e{MSM_LOG2N}_points_per_s",
            "value": round(msm20, 1),
            "unit": "pts/s",
            "vs_baseline": round(msm20 / BASE_MSM_NATIVE, 3),
            "extra": extra,
        }))
    else:
        pos = extra.get("poseidon_hashes_per_s", 0.0)
        print(json.dumps({
            "metric": "poseidon_hashes_per_s_per_chip",
            "value": pos,
            "unit": "hashes/s",
            "vs_baseline": round(pos / BASE_POSEIDON, 4),
            "extra": extra,
        }))


if __name__ == "__main__":
    main()
