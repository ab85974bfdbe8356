#!/usr/bin/env python3
"""Device-time attribution for the grid MSM via jax.profiler + xprof.

Captures an xplane trace of ONE warm MSM execution and prints the top
device ops by self-time — the measurement PLAN.md calls for before any
further glue restructuring (two blind restructures regressed in round 2).

Usage: python scripts/msm_profile.py [log2N] [c] [lanes] [complete|incomplete]
                                     [limb15|limb16]
"""
import glob
import json
import os
import random
import sys
import time

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
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    complete = not (len(sys.argv) > 4 and sys.argv[4] == "incomplete")
    limb15 = len(sys.argv) > 5 and sys.argv[5] == "limb15"
    n = 1 << log2n
    print(f"profile n=2^{log2n} c={c} lanes={lanes} complete={complete} "
          f"limb15={limb15}", flush=True)
    rng = random.Random(7)
    aff = native_bridge.g1_gen_mul_batch(
        [rng.randrange(1, 1 << 62) for _ in range(n)])
    ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])

    def run(limbs):
        out = mg.msm_grid_g1((X, Y, Z), limbs, c=c, backend="pallas",
                             lanes=lanes, complete=complete, limb15=limb15)
        return int(jax.device_get(jnp.sum(out[0])))

    t0 = time.time()
    run(jnp.asarray(ints_to_limbs(ks)))
    print(f"warm (compile+exec): {time.time()-t0:.1f}s", flush=True)

    lm2 = jnp.asarray(ints_to_limbs([(k + 1) % FR_MOD for k in ks]))
    tdir = f"/tmp/msm_prof_{log2n}_{c}_{'l15' if limb15 else 'l16'}"
    t0 = time.time()
    with jax.profiler.trace(tdir):
        run(lm2)
    wall = time.time() - t0
    print(f"traced run: {wall:.3f}s -> {n/wall:,.0f} pts/s", flush=True)

    paths = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    report(paths[-1])


def report(path, top=40):
    from xprof.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data([path], "framework_op_stats", {})
    table = json.loads(data if isinstance(data, str) else data.decode())
    if isinstance(table, list):
        table = table[0]
    rows = []
    for r in table["rows"]:
        v = [c["v"] for c in r["c"]]
        # rank, host/device, type, name, occurrences, total, avg,
        # total_self, avg_self, dev%, dev_cum%, ...
        if v[1] != "Device":
            continue
        rows.append((float(v[7]), int(v[4]), v[2], v[3]))
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    print(f"\ndevice total self-time: {tot/1e6:.3f}s  ({path})")
    print(f"{'self(ms)':>9} {'%':>5} {'occ':>6}  op")
    for st, occ, typ, name in rows[:top]:
        print(f"{st/1e3:9.2f} {100*st/tot:5.1f} {occ:6d}  {typ:18s} "
              f"{name[:90]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1].endswith(".pb"):
        report(sys.argv[1])
    else:
        main()
