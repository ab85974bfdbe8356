#!/usr/bin/env python3
"""Precompute bench.py's MSM expected points with the native C++ oracle.

Writes bench_expected.json at the repo root (committed). Run after changing
tpu_zkpool/benchvec.msm_inputs. Pure host-side — no TPU needed.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tpu_zkpool import native_bridge
from tpu_zkpool import benchvec


def main():
    for log2n in (17, 20, 22):
        t0 = time.time()
        base, ks = benchvec.msm_inputs(log2n)
        aff = native_bridge.g1_gen_mul_batch(base)
        exp = native_bridge.g1_msm(ks, aff)
        benchvec.store_expected(log2n, exp)
        print(f"log2n={log2n}: {hex(exp[0])[:18]}… in {time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
