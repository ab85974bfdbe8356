"""Deterministic benchmark input vectors + precommitted expected results.

bench.py's MSM metric uses fixed-seed inputs so the expected result can be
computed ONCE by the native C++ Pippenger oracle (~45 s at 2^20 — too slow
for the driver-budgeted benchmark path, VERDICT.md round-2 weak #1) and
committed to ``bench_expected.json`` at the repo root. The benchmark then
asserts the TPU result against the committed point and only falls back to
the live oracle when no committed entry exists for the requested size/seed.

Regenerate with ``python scripts/gen_bench_expected.py`` after changing the
input recipe below (both consumers share this module, so they cannot drift).
"""

from __future__ import annotations

import json
import os
import random

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPECTED_PATH = os.path.join(_REPO, "bench_expected.json")

MSM_SEED = 7


def msm_inputs(log2n: int, seed: int = MSM_SEED):
    """Base-point exponents and MSM scalars for the bench MSM metric.

    Must consume the RNG in exactly this order — the committed expected
    points depend on it.
    """
    from tpu_zkpool.fields.bn254 import FR_MOD

    n = 1 << log2n
    rng = random.Random(seed)
    base = [rng.randrange(1, 1 << 62) for _ in range(n)]
    ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
    return base, ks


def expected_key(log2n: int, seed: int = MSM_SEED) -> str:
    return f"msm_g1_seed{seed}_log{log2n}"


def load_expected(log2n: int, seed: int = MSM_SEED):
    """Committed (x, y) affine ints for the bench MSM, or None."""
    if not os.path.exists(EXPECTED_PATH):
        return None
    with open(EXPECTED_PATH) as f:
        table = json.load(f)
    ent = table.get(expected_key(log2n, seed))
    if ent is None:
        return None
    return int(ent[0], 16), int(ent[1], 16)


def store_expected(log2n: int, xy, seed: int = MSM_SEED) -> None:
    table = {}
    if os.path.exists(EXPECTED_PATH):
        with open(EXPECTED_PATH) as f:
            table = json.load(f)
    table[expected_key(log2n, seed)] = [hex(int(xy[0])), hex(int(xy[1]))]
    with open(EXPECTED_PATH, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
        f.write("\n")
