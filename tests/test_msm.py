"""Pippenger MSM vs. the affine oracle (small sizes; perf runs in bench).

Gated behind RUN_SLOW=1: the MSM graph takes minutes of XLA-CPU compile.
The MSM is additionally cross-checked against the native C++ implementation
in the TPU integration runs (docs/PLAN.md).
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                                reason="minutes of XLA compile (RUN_SLOW=1)")

import jax.numpy as jnp
import numpy as np

from tpu_zkpool.curve.weierstrass import G1
from tpu_zkpool.msm import msm
from tpu_zkpool.msm.pippenger import window_digits
from tpu_zkpool.refimpl import pairing_ref as pr
from tpu_zkpool.fields.bn254 import G1_GX, G1_GY


def test_msm_small():
    rng = random.Random(42)
    N = 16
    ks = [rng.randrange(1 << 16) for _ in range(N)]
    base = [rng.randrange(1 << 30) for _ in range(N)]
    pts_aff = [pr.g1_mul(b, (G1_GX, G1_GY)) for b in base]
    pts = G1.from_affine_ints([p[0] for p in pts_aff], [p[1] for p in pts_aff])
    digs = jnp.asarray(window_digits(ks, nbits=16, c=4))
    res = msm(G1, pts, digs, 4)
    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in res))
    exp = None
    for k, p in zip(ks, pts_aff):
        exp = pr.g1_add(exp, pr.g1_mul(k, p))
    assert (int(np.asarray(xs).reshape(-1)[0]),
            int(np.asarray(ys).reshape(-1)[0])) == exp
