#!/usr/bin/env python3
"""Headline benchmark sweep on one TPU chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline",
"extra"} INCREMENTALLY — re-emitted after every completed metric, so the
tail of stdout always carries the best snapshot even if the driver's
wall-clock budget expires mid-sweep (round-2 lesson: an all-or-nothing
benchmark recorded nothing; round-3 lesson: per-metric subprocesses each
pay the ~5-7 min axon TPU attach, so three metrics burned their whole
caps on attach/compile and the driver killed the sweep at rc=124).

Architecture (round 4):
- The PARENT never imports jax. It spawns at most two CHILD processes
  (group A: MSM + hash metrics; group B: Groth16 prove/verify), streams
  their "RESULT <key> <value>" lines, re-emits the headline JSON after
  every line, kills whatever is still running at the global deadline,
  and ALWAYS exits 0 — the driver's tail parse then records the best
  snapshot no matter where the budget ran out.
- Each child runs its metrics sequentially in ONE process, so the TPU
  attach and jax init are paid once per group, and the Groth16 metrics
  share one setup + DeviceProvingKey (round 3 re-did that per metric).
- Metric order is by headline value: msm 2^20 first (the BASELINE.md
  flagship), then the cheap-compile metrics, then the pathological
  small-N prove graphs (~30 min cold compile, docs/PLAN.md) last in
  their own group so a cold cache can only eat the END of the budget.

Headline = grid-MSM throughput at 2^20 BN254 points. vs_baseline is
measured against the repo's own single-core native C++ Pippenger — the
reference's actual prover substrate class (gnark on CPU; the reference
publishes no numbers, SURVEY.md §6).

Measurement notes for this environment (axon-tunneled TPU):
- ``block_until_ready`` does not block on actual remote execution; a
  device_get of a reduced scalar forces the full round trip.
- Inputs vary per timing iteration (chained or reseeded) so no cache can
  short-circuit the work.
- The persistent compile cache does not reliably survive tunnel swaps
  (docs/PLAN.md env notes), so the sweep is budgeted to land its
  headline even with every compile cold.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_POSEIDON = 1_000_000.0          # BASELINE.md target
BASE_MSM_NATIVE = 27_000.0           # native/bn254.cpp single core, pts/s
MSM_LOG2N = 20
HEADLINE_KEY = f"msm_g1_2e{MSM_LOG2N}_pts_per_s"


# --------------------------------------------------------------------------
# Metric implementations (child side — these import jax).
# --------------------------------------------------------------------------


def _jax_setup():
    """Force the TPU platform + persistent compile cache.

    The driver may export CPU-forcing flags meant for the multichip
    dryrun; strip them so the bench always measures the real chip and
    the compile-cache keys match this session's warm run.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() in ("cpu",):
        os.environ.pop("JAX_PLATFORMS")
    flags = os.environ.get("XLA_FLAGS", "")
    kept = [f for f in flags.split() if "host_platform_device_count" not in f]
    if kept:
        os.environ["XLA_FLAGS"] = " ".join(kept)
    else:
        os.environ.pop("XLA_FLAGS", None)
    from tpu_zkpool.utils import enable_compile_cache
    enable_compile_cache()


def bench_poseidon():
    import jax
    import jax.numpy as jnp
    from tpu_zkpool.hash import poseidon_pallas

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _hash_chain(seed, batch, iters):
        key = jax.random.PRNGKey(seed)
        x = jax.random.randint(key, (batch, 16), 0, 1 << 16,
                               dtype=jnp.int32).astype(jnp.uint32)

        def body(s, _):
            return poseidon_pallas.hash2_pallas(s, s), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out, dtype=jnp.uint32)

    batch, iters = 1 << 15, 4
    int(jax.device_get(_hash_chain(0, batch, iters)))  # compile + warm
    times = []
    for s in range(1, 4):
        t0 = time.time()
        int(jax.device_get(_hash_chain(s, batch, iters)))
        times.append(time.time() - t0)
    return batch * iters / min(times)


def bench_msm(log2n, c=13, iters=3):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpu_zkpool.curve.weierstrass import G1
    from tpu_zkpool import benchvec, native_bridge
    from tpu_zkpool.msm import grid as mg

    n = 1 << log2n
    # Disk-cached device-ready limb arrays: the host prep (point gen +
    # bigint Montgomery conversion) was ~80% of the warm metric wall.
    X, Y, Z, limbs_np = benchvec.msm_device_arrays(log2n)

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

    X, Y, Z = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)
    limbs = jnp.asarray(limbs_np)
    # shift MUST be uint32 like the timed calls: a Python-int 0 traces
    # weak-typed i32 and costs a second full compile of the whole MSM
    # graph (measured 66-71 s at 2^20).
    out = run(X, Y, Z, limbs, c, jnp.uint32(0))  # compile + check
    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in out))
    got = (int(np.asarray(xs).reshape(-1)[0]),
           int(np.asarray(ys).reshape(-1)[0]))
    exp = benchvec.load_expected(log2n)
    if exp is None:                          # no committed point: live oracle
        base, ks = benchvec.msm_inputs(log2n)
        exp = native_bridge.g1_msm(ks, native_bridge.g1_gen_mul_batch(base))
    assert got == tuple(exp), "TPU MSM != committed native-oracle point"

    times = []
    for it in range(iters):
        t0 = time.time()
        o = run(X, Y, Z, limbs, c, jnp.uint32(it + 1))
        jax.device_get(o[0])       # 64-byte fetch; awaits the whole graph
        times.append(time.time() - t0)
    return n / min(times)


def bench_rlwe(batch=4096, iters=3):
    import jax
    import jax.numpy as jnp
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


def _withdraw_setup():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
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


class _Groth16State:
    """Setup + DeviceProvingKey shared across the prove/verify metrics
    (one compile-heavy construction instead of three)."""

    def __init__(self):
        from tpu_zkpool.groth16 import prove_tpu
        self.ar, self.w, self.pk, self.vk = _withdraw_setup()
        self.dpk = prove_tpu.DeviceProvingKey(self.pk, backend="pallas",
                                              complete=True)
        self.proofs32 = None


def bench_groth16_prove(st, iters=3):
    """Warm device-prover throughput on the committed withdraw circuit
    (8,899 R1CS rows after the sk*G gadget): 4 G1 grid MSMs + the G2 MSM +
    the H(X) NTT on chip. Each proof uses a fresh seed (fresh r/s blinding)
    so no tunnel cache can short-circuit the run; the first proof is
    verified on the host."""
    from tpu_zkpool.groth16 import prove_tpu
    from tpu_zkpool.refimpl import groth16_ref as g16

    proof = prove_tpu.prove(st.dpk, st.ar.r1cs, st.w, seed=100)  # warm
    assert g16.verify(st.vk, proof, st.w[1:st.ar.r1cs.num_public])
    times = []
    for it in range(iters):
        t0 = time.time()
        prove_tpu.prove(st.dpk, st.ar.r1cs, st.w, seed=101 + it)
        times.append(time.time() - t0)
    return 1.0 / min(times)


def bench_groth16_prove_batch(st, B=4, iters=3):
    """Batched prover throughput: B proofs per prove_batch call (all MSM
    legs of every proof dispatched before any fetch), the payroll scenario
    (client/payroll-demo.ts:326-350) at framework scale."""
    from tpu_zkpool.groth16 import prove_tpu
    from tpu_zkpool.refimpl import groth16_ref as g16

    ws = [st.w] * B
    proofs = prove_tpu.prove_batch(st.dpk, st.ar.r1cs, ws, seed=300)  # warm
    assert g16.verify(st.vk, proofs[0], st.w[1:st.ar.r1cs.num_public])
    times = []
    for it in range(iters):
        t0 = time.time()
        prove_tpu.prove_batch(st.dpk, st.ar.r1cs, ws, seed=400 + B * it)
        times.append(time.time() - t0)
    return B / min(times)


def bench_verify_batch(st, B=256, distinct=32):
    """Batched verify of B withdraw-circuit proofs (the committed
    8,899-row circuit's VK — not a toy R1CS): ``distinct`` real proofs
    from the device prover (distinct blinding seeds) tiled to batch B —
    verify work is data-independent, so the tiling measures honest
    per-verification throughput while keeping the proving prelude within
    the bench budget. verify_batch (round 5) runs the precomputed-lines
    Miller loop — fixed VK legs walked once on the host, per-proof B legs
    with host-batched Fp2 inversions, e(alpha,beta) as the compare
    target — and one shared cyclotomic final exponentiation. This is the
    on-chain per-proof verify of withdraw.rs:163-175, batched chip-wide."""
    from tpu_zkpool.groth16 import prove_tpu, verify_tpu

    if st.proofs32 is None:
        st.proofs32 = prove_tpu.prove_batch(st.dpk, st.ar.r1cs,
                                            [st.w] * distinct, seed=900)
    proofs = (st.proofs32 * (B // distinct + 1))[:B]
    pubs = [st.w[1:st.ar.r1cs.num_public]] * B
    ok = verify_tpu.verify_batch(st.vk, proofs, pubs)   # compile + warm
    assert ok.all()
    t0 = time.time()
    ok = verify_tpu.verify_batch(st.vk, proofs, pubs)
    assert ok.all()
    return B / (time.time() - t0)


# --------------------------------------------------------------------------
# Child driver: run one metric GROUP sequentially, streaming results.
# --------------------------------------------------------------------------

# Estimated minimum useful wall (warm compile) per metric; a metric is
# skipped when less than this remains, so the child never starts work it
# cannot finish.
# Round 5: verify moved BEFORE prove_batch (VERDICT r4 #2 — it was the
# one metric the round-4 deadline cut) and scaled to batch 256 over the
# precomputed-lines pairing path.
GROUPS = {
    "A": [("msm20", 60), ("poseidon", 30), ("rlwe", 30), ("msm17", 45),
          ("msm22", 90)],
    "B": [("prove", 90), ("verify256", 60), ("prove_batch", 60)],
}

KEYS = {
    "msm20": HEADLINE_KEY,
    "msm17": "msm_g1_2e17_pts_per_s",
    "msm22": "msm_g1_2e22_pts_per_s",
    "poseidon": "poseidon_hashes_per_s",
    "rlwe": "rlwe_polymul_1024_per_s",
    "prove": "groth16_prove_withdraw_per_s",
    "prove_batch": "groth16_prove_batch4_per_s",
    "verify256": "groth16_verify_batch256_per_s",
}


def child(group, deadline):
    _jax_setup()
    st = None

    def runner(name):
        nonlocal st
        if name == "msm20":
            return bench_msm(MSM_LOG2N)
        if name == "msm17":
            return bench_msm(17)
        if name == "msm22":
            return bench_msm(22, iters=2)
        if name == "poseidon":
            return bench_poseidon()
        if name == "rlwe":
            return bench_rlwe()
        if name in ("prove", "prove_batch", "verify256"):
            if st is None:
                st = _Groth16State()
            if name == "prove":
                return bench_groth16_prove(st)
            if name == "prove_batch":
                return bench_groth16_prove_batch(st)
            return bench_verify_batch(st)
        raise ValueError(name)

    for name, min_s in GROUPS[group]:
        if time.time() > deadline - min_s:
            print(f"NOTE {name} skipped: group deadline", flush=True)
            continue
        t0 = time.time()
        try:
            v = runner(name)
            print(f"RESULT {KEYS[name]} {v!r}", flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping
            print(f"NOTE {name} error: {str(e)[:160]}", flush=True)
        print(f"NOTE {name} wall {time.time() - t0:.1f}s", flush=True)


# --------------------------------------------------------------------------
# Parent: stream children, re-emit headline, hard deadline, rc=0 always.
# --------------------------------------------------------------------------


def emit(extra):
    msm20 = extra.get(HEADLINE_KEY)
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


def _stream_child(group, deadline, extra, notes, hard_deadline=None):
    """Spawn one metric-group child; stream its RESULT/NOTE lines until
    the deadline. Returns when the child exits or is killed.

    ``hard_deadline``: when set, the child is only killed at ``deadline``
    if the headline metric has already landed — otherwise it keeps
    running (up to the hard deadline) rather than wasting a nearly-done
    cold compile of the headline graph."""
    import selectors
    import signal
    import subprocess

    err_path = f"/tmp/bench_child_{group}.err"
    with open(err_path, "w") as errf:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", group,
             repr(deadline)],
            stdout=subprocess.PIPE, stderr=errf,
            start_new_session=True)

    # Raw-fd line reader: selectors + TextIO.readline can strand a second
    # line inside the text buffer (invisible to select), and a RESULT
    # line written just before the deadline must still be parsed after
    # the kill — so read bytes ourselves and keep our own buffer.
    buf = b""

    def handle(data):
        nonlocal buf
        buf += data
        while b"\n" in buf:
            raw, buf = buf.split(b"\n", 1)
            line = raw.decode(errors="replace").strip()
            if line.startswith("RESULT "):
                _, key, val = line.split(" ", 2)
                try:
                    extra[key] = round(float(val), 3)
                except ValueError:
                    notes.append(f"bad value for {key}")
                emit(extra)
            elif line.startswith("NOTE "):
                notes.append(line[5:])

    fd = proc.stdout.fileno()
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    try:
        while True:
            now = time.time()
            eff = deadline
            if hard_deadline is not None and HEADLINE_KEY not in extra:
                eff = hard_deadline
            if now >= eff:
                notes.append(f"group {group} killed at deadline")
                break
            if not sel.select(timeout=min(10.0, eff - now)):
                if proc.poll() is not None:
                    break
                continue
            data = os.read(fd, 65536)
            if not data:              # EOF
                break
            handle(data)
    finally:
        sel.close()
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
        # Drain anything the child wrote before dying — a completed
        # metric must not be lost to kill timing (after SIGKILL the pipe
        # has whatever was buffered, then EOF).
        try:
            os.set_blocking(fd, False)
            while True:
                try:
                    data = os.read(fd, 65536)
                except (BlockingIOError, OSError):
                    break
                if not data:
                    break
                handle(data)
        except Exception:
            pass
        try:
            proc.stdout.close()
        except Exception:
            pass
        try:
            proc.wait(timeout=30)
        except Exception:
            notes.append(f"group {group} unreaped")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2], float(sys.argv[3]))
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "1380"))
    t_start = time.time()
    deadline = t_start + budget
    extra = {"budget_s": budget}
    notes = []
    # Group A gets everything up to a reserve for group B; if A finishes
    # early, B gets the slack. 420 s is enough for B's whole warm path.
    reserve_b = min(420.0, budget * 0.3)
    try:
        # Group A runs to its soft deadline — or the hard one while the
        # headline metric hasn't landed (don't waste a nearly-finished
        # cold msm20 compile to start a prove group that cannot finish
        # cold anyway, docs/PLAN.md round-3 warm-up evidence).
        _stream_child("A", deadline - reserve_b, extra, notes,
                      hard_deadline=deadline - 30)
        if time.time() < deadline - 60:
            _stream_child("B", deadline - 15, extra, notes)
        else:
            notes.append("group B skipped: budget exhausted by group A")
    except Exception as e:  # noqa: BLE001 — the headline must still land
        notes.append(f"parent error: {str(e)[:200]}")
    extra["notes"] = notes[-20:]
    extra["wall_s"] = round(time.time() - t_start, 1)
    emit(extra)
    sys.exit(0)


if __name__ == "__main__":
    main()
