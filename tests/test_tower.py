"""Batched Fp2/Fp12 tower arithmetic vs. the Python pairing reference.

(The full Miller loop / final exp compile for minutes; they are validated
in the TPU integration runs — see docs/PLAN.md — while the suite covers the
tower ops they are built from.)
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.curve import tower as tw
from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.refimpl import pairing_ref as pr


def _f2_dev(vals):
    c0 = jnp.asarray(FP.to_mont(np.asarray([v[0] for v in vals], dtype=object)))
    c1 = jnp.asarray(FP.to_mont(np.asarray([v[1] for v in vals], dtype=object)))
    return (c0, c1)


def _f2_host(dev, lane):
    return (int(FP.from_mont(np.asarray(dev[0])[lane])),
            int(FP.from_mont(np.asarray(dev[1])[lane])))


def test_f2_ops():
    rng = random.Random(12)
    a = [(rng.randrange(pr.P), rng.randrange(pr.P)) for _ in range(4)]
    b = [(rng.randrange(pr.P), rng.randrange(pr.P)) for _ in range(4)]
    da, db = _f2_dev(a), _f2_dev(b)
    mul = jax.jit(tw.f2_mul)(da, db)
    sq = jax.jit(tw.f2_sqr)(da)
    inv = jax.jit(tw.f2_inv)(da)
    xi = jax.jit(tw.f2_mul_by_xi)(da)
    for i in range(4):
        assert _f2_host(mul, i) == pr.f2_mul(a[i], b[i])
        assert _f2_host(sq, i) == pr.f2_sqr(a[i])
        assert _f2_host(inv, i) == pr.f2_inv(a[i])
        assert _f2_host(xi, i) == pr.f2_mul(a[i], pr.XI)


def test_f12_mul():
    rng = random.Random(13)
    B = 2
    a = [tuple((rng.randrange(pr.P), rng.randrange(pr.P)) for _ in range(6))
         for _ in range(B)]
    b = [tuple((rng.randrange(pr.P), rng.randrange(pr.P)) for _ in range(6))
         for _ in range(B)]

    def to_dev(els):
        return tuple(_f2_dev([e[k] for e in els]) for k in range(6))

    da, db = to_dev(a), to_dev(b)
    mul = jax.jit(tw.f12_mul)(da, db)
    for i in range(B):
        exp = pr.f12_mul(a[i], b[i])
        got = tuple(_f2_host(c, i) for c in mul)
        assert got == exp


def test_f12_sparse_line_mul():
    rng = random.Random(14)
    a = [tuple((rng.randrange(pr.P), rng.randrange(pr.P)) for _ in range(6))]
    l = [(rng.randrange(pr.P), rng.randrange(pr.P)) for _ in range(3)]

    def to_dev(els):
        return tuple(_f2_dev([e[k] for e in els]) for k in range(6))

    da = to_dev(a)
    dl = [_f2_dev([x]) for x in l]
    got_dev = jax.jit(tw.f12_mul_sparse_line)(da, *dl)
    sparse = (l[0], l[1], pr.F2_ZERO, l[2], pr.F2_ZERO, pr.F2_ZERO)
    exp = pr.f12_mul(a[0], sparse)
    got = tuple(_f2_host(c, 0) for c in got_dev)
    assert got == exp
