"""Real-TPU validation + timing of the grid-accumulator Pallas MSM.

Usage: python scripts/tpu_msm_check.py [log2N] [c]
Correctness vs the native C++ Pippenger oracle, then a timed run following
the axon measurement rules (fresh data per iteration, device_get sync).
"""
import sys, os, time, random
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_zkpool.utils import enable_compile_cache
enable_compile_cache()

from tpu_zkpool.curve.weierstrass import G1
from tpu_zkpool.fields.bn254 import FR_MOD
from tpu_zkpool.fields.limbs import ints_to_limbs
from tpu_zkpool import native_bridge
from tpu_zkpool.msm import grid as mg

def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    complete = not (len(sys.argv) > 4 and sys.argv[4] == "incomplete")
    limb15 = not (len(sys.argv) > 5 and sys.argv[5] == "limb16")
    print(f"lanes={lanes} complete={complete} limb15={limb15}", flush=True)
    n = 1 << log2n
    print(f"devices: {jax.devices()}", flush=True)
    rng = random.Random(7)
    t0 = time.time()
    base = [rng.randrange(1, 1 << 62) for _ in range(n)]
    aff = native_bridge.g1_gen_mul_batch(base)
    ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
    print(f"host setup: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    limbs = jnp.asarray(ints_to_limbs(ks))
    print(f"to_mont: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    out = mg.msm_grid_g1((X, Y, Z), limbs, c=c, backend="pallas",
                         lanes=lanes, complete=complete, limb15=limb15)
    s = int(jax.device_get(jnp.sum(out[0])))  # force real execution
    print(f"first run (compile+exec): {time.time()-t0:.1f}s", flush=True)

    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in out))
    got = (int(np.asarray(xs).reshape(-1)[0]), int(np.asarray(ys).reshape(-1)[0]))
    t0 = time.time()
    exp = native_bridge.g1_msm(ks, aff)
    print(f"native oracle: {time.time()-t0:.1f}s", flush=True)
    assert got == exp, f"MISMATCH: {got} != {exp}"
    print("CORRECT vs native oracle", flush=True)

    # timed: vary scalars per iteration (avoid the tunnel result cache)
    iters = 3
    limbs_list = []
    for it in range(iters):
        ks2 = [(k + it + 1) % FR_MOD for k in ks]
        limbs_list.append(jnp.asarray(ints_to_limbs(ks2)))
    t0 = time.time()
    acc = 0
    for lm in limbs_list:
        out = mg.msm_grid_g1((X, Y, Z), lm, c=c, backend="pallas",
                             lanes=lanes, complete=complete, limb15=limb15)
        acc ^= int(jax.device_get(jnp.sum(out[0])))
    dt = (time.time() - t0) / iters
    print(f"timed: {dt:.3f}s per MSM of 2^{log2n} -> {n/dt:,.0f} pts/s", flush=True)




def main_g2():
    """G2 (Fp2) grid MSM vs the native oracle: tpu_msm_check.py g2 [log2N]."""
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    complete = not (len(sys.argv) > 4 and sys.argv[4] == "incomplete")
    limb15 = not (len(sys.argv) > 5 and sys.argv[5] == "limb16")
    n = 1 << log2n
    print(f"G2 check n=2^{log2n} lanes={lanes} complete={complete} "
          f"limb15={limb15}", flush=True)
    rng = random.Random(5)
    base = [rng.randrange(1, 1 << 62) for _ in range(n)]
    t0 = time.time()
    aff = native_bridge.g2_gen_mul_batch(base)
    ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
    print(f"host setup: {time.time()-t0:.1f}s", flush=True)
    from tpu_zkpool.groth16.prove_tpu import _points_device_g2, _g2_affine
    pts, npad = _points_device_g2(aff)
    assert npad == n
    limbs = jnp.asarray(ints_to_limbs(ks))
    t0 = time.time()
    out = mg.msm_grid_g2(pts, limbs, c=13, backend="pallas", lanes=lanes,
                         complete=complete, limb15=limb15)
    got = _g2_affine(out)
    print(f"first run: {time.time()-t0:.1f}s", flush=True)
    exp = native_bridge.g2_msm(ks, aff)
    assert got == exp, f"G2 MISMATCH"
    print("G2 CORRECT vs native oracle", flush=True)
    t0 = time.time()
    iters = 3
    for it in range(iters):
        ks2 = [(k + it + 1) % FR_MOD for k in ks]
        out = mg.msm_grid_g2(pts, jnp.asarray(ints_to_limbs(ks2)), c=13,
                             backend="pallas", lanes=lanes,
                             complete=complete, limb15=limb15)
        int(jax.device_get(jnp.sum(out[0])))
    dt = (time.time() - t0) / iters
    print(f"G2 timed: {dt:.3f}s per MSM -> {n/dt:,.0f} pts/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "g2":
        main_g2()
    else:
        main()
