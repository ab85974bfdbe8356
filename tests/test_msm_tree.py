"""Batched-affine tree bucket accumulation (msm/affine_tree.py).

The full grid MSM with ``tree=True`` runs against the native C++
Pippenger oracle on the portable XLA backend, including the adversarial
distributions the static level-size bounds exist for (all-equal scalars
-> one huge segment; zero scalars; identity padding; duplicate points
exercising the doubling branch). The Pallas chunk kernel is validated
bit-exact against the XLA path on real TPU (scripts/tree_kernel_check
pattern — Mosaic is TPU-only, and interpret mode cannot execute the
254-iteration Fermat loop in reasonable time)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zkpool.curve.weierstrass import G1
from tpu_zkpool.fields.bn254 import FR_MOD
from tpu_zkpool.fields.limbs import ints_to_limbs, NLIMB
from tpu_zkpool import native_bridge
from tpu_zkpool.msm import grid as mg
from tpu_zkpool.msm import affine_tree as at


def _simulate_sizes(seg_lens, T):
    """Exact level sizes for a given segment-length multiset."""
    sizes, pairs = [], []
    cur = list(seg_lens)
    for t in range(T + 1):
        sizes.append(sum(cur))
        if t < T:
            pairs.append(sum(c // 2 for c in cur))
            cur = [-(-c // 2) for c in cur]
    return sizes, pairs


def test_tree_plan_bounds_hold():
    rng = random.Random(2)
    n, half = 4096, 128
    cases = []
    for _ in range(30):                      # random segmentations
        g = rng.randrange(1, half + 2)
        cuts = sorted(rng.sample(range(1, n), g - 1)) if g > 1 else []
        lens = [b - a for a, b in zip([0] + cuts, cuts + [n])]
        cases.append(lens)
    cases.append([n])                        # one segment (all-equal)
    cases.append([1] * half + [n - half])    # max segments + one fat tail
    bound_s, bound_p = at.tree_plan(n, half)
    T = len(bound_p)
    for lens in cases:
        assert len(lens) <= half + 1 and sum(lens) == n
        s, p = _simulate_sizes(lens, T)
        for t in range(T + 1):
            assert s[t] <= bound_s[t], (t, s[t], bound_s[t])
        for t in range(T):
            assert p[t] <= bound_p[t], (t, p[t], bound_p[t])
        assert all(c == 1 for c in [-(-l // (1 << T)) for l in lens])


def _run_msm(ks, aff, c=13, nbits=39, tree=True, complete=False):
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    limbs = jnp.asarray(ints_to_limbs(ks))
    out = mg.msm_grid_g1((X, Y, Z), limbs, c=c, backend="xla", tree=tree,
                         nbits=nbits, complete=complete)
    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in out))
    return (int(np.asarray(xs).reshape(-1)[0]),
            int(np.asarray(ys).reshape(-1)[0]))


def _oracle(ks, aff):
    live = [(k, p) for k, p in zip(ks, aff) if k]
    if not live:
        return (0, 0)
    pt = native_bridge.g1_msm([k for k, _ in live], [p for _, p in live])
    return tuple(pt) if pt is not None else (0, 0)


N = 1024  # one lane tile; tree T = 10 levels; 39-bit scalars -> 3 windows


@pytest.fixture(scope="module")
def points():
    rng = random.Random(9)
    base = [rng.randrange(1, 1 << 62) for _ in range(N)]
    return native_bridge.g1_gen_mul_batch(base)


def test_tree_msm_random_vs_oracle(points):
    rng = random.Random(10)
    ks = [rng.randrange(0, 1 << 38) for _ in range(N)]
    assert _run_msm(ks, points) == _oracle(ks, points)


def test_tree_msm_skewed_scalars(points):
    """All-equal scalars: every point lands in ONE bucket segment per
    window — the worst case for the level-size bounds."""
    ks = [5] * N
    assert _run_msm(ks, points) == _oracle(ks, points)


def test_tree_msm_zeros_and_identity_rows(points):
    rng = random.Random(12)
    ks = [0 if i % 3 == 0 else rng.randrange(0, 1 << 38) for i in range(N)]
    got = _run_msm(ks, points)
    assert got == _oracle(ks, points)
    # identity (Z = 0) padding rows contribute nothing
    X, Y, Z = G1.from_affine_ints([p[0] for p in points],
                                  [p[1] for p in points])
    Z = jnp.asarray(np.asarray(Z).copy())
    zn = np.asarray(Z).copy()
    zn[::5] = 0
    limbs = jnp.asarray(ints_to_limbs(ks))
    out = mg.msm_grid_g1((X, Y, jnp.asarray(zn)), limbs, c=13, backend="xla",
                         tree=True, nbits=39, complete=False)
    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in out))
    ks2 = [0 if i % 5 == 0 else k for i, k in enumerate(ks)]
    assert (int(np.asarray(xs).reshape(-1)[0]),
            int(np.asarray(ys).reshape(-1)[0])) == _oracle(ks2, points)


def test_tree_msm_duplicate_points_complete(points):
    """Duplicate points with equal scalars meet in the same bucket and
    pair as a doubling — complete mode handles it."""
    rng = random.Random(13)
    aff = [points[i % 16] for i in range(N)]     # heavy duplication
    ks = [rng.randrange(0, 1 << 38) | 1 for _ in range(N)]
    assert _run_msm(ks, aff, complete=True) == _oracle(ks, aff)


def test_level_xla_inf_propagation():
    """p + (-p) -> infinity flag; inf operands pass the other side."""
    from tpu_zkpool.fields.fctx import FP
    import tpu_zkpool.refimpl.pairing_ref as pr
    rng = random.Random(14)
    base = [rng.randrange(1, 1 << 62) for _ in range(4)]
    aff = native_bridge.g1_gen_mul_batch(base)
    rows = np.concatenate([
        FP.to_mont(np.asarray([p[0] for p in aff], dtype=object)),
        FP.to_mont(np.asarray([p[1] for p in aff], dtype=object))],
        axis=1).astype(np.uint32)
    negr = np.concatenate([
        FP.to_mont(np.asarray([p[0] for p in aff], dtype=object)),
        FP.to_mont(np.asarray([(pr.P - p[1]) for p in aff], dtype=object))],
        axis=1).astype(np.uint32)
    L = jnp.asarray(rows)
    R = jnp.asarray(negr)                        # R = -L -> all inf
    out, inf = at.tree_level_xla(L, R, jnp.zeros(4, jnp.uint32), True)
    assert np.asarray(inf).all()
    # infL set -> output is R verbatim
    out, inf = at.tree_level_xla(L, R, jnp.full(4, 1, jnp.uint32), True)
    assert np.array_equal(np.asarray(out), negr)
    assert not np.asarray(inf).any()
