"""15-bit-limb kernel arithmetic (curve/limb15.py) — CPU bit-exactness.

The Pallas MSM's limb15 mode runs these exact functions inside the prefix
kernel (msm/grid.py::_make_prefix_kernel); here they execute eagerly on
plain jnp vectors so the default suite proves every field op, the domain
conversions, and the full Jacobian point formulas bit-exact against
Python-bigint / native-C++ oracles. Real-TPU validation + timing:
scripts/tpu_msm_check.py. Replaces the prover math gnark runs behind
``sunspot prove`` (/root/reference/client/proof.helper.ts:64)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_zkpool.curve import limb15 as L
from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.fields.limbs import int_to_limbs, limbs_to_int
from tpu_zkpool.msm.grid import _pmadd, _padd, _pdouble
from tpu_zkpool import native_bridge

P = FP.modulus
R15 = L.R15


def _regs(xs, mont=True):
    """ints -> 17x15-bit R'-domain register list (shape (B,) each)."""
    vals = [x * R15 % P if mont else x for x in xs]
    arr = np.stack([L.to15(v) for v in vals])
    return [jnp.asarray(arr[:, i]) for i in range(L.NL)]


def _ints(regs, mont=True):
    arr = np.stack([np.asarray(r) for r in regs], axis=-1)
    out = []
    for k in range(arr.shape[0]):
        v = L.from15(arr[k])
        out.append(v * pow(R15, -1, P) % P if mont else v)
    return out


def test_field_ops_bit_exact():
    rng = random.Random(7)
    B = 24
    a = [rng.randrange(P) for _ in range(B)]
    b = [rng.randrange(P) for _ in range(B)]
    a[0], b[1], a[2], b[2] = 0, 0, P - 1, P - 1
    A, Bv = _regs(a), _regs(b)
    assert _ints(L.mul15(A, Bv)) == [x * y % P for x, y in zip(a, b)]
    assert _ints(L.sqr15(A)) == [x * x % P for x in a]
    assert _ints(L.add15(A, Bv)) == [(x + y) % P for x, y in zip(a, b)]
    assert _ints(L.sub15(A, Bv)) == [(x - y) % P for x, y in zip(a, b)]
    assert _ints(L.dbl15(A)) == [2 * x % P for x in a]
    assert _ints(L.neg15(A)) == [(-x) % P for x in a]
    c = [rng.randrange(P) for _ in range(B)]
    d = [rng.randrange(P) for _ in range(B)]
    C, D = _regs(c), _regs(d)
    assert _ints(L.mul_sub15(A, Bv, C, D)) == \
        [(x * y - u * v) % P for x, y, u, v in zip(a, b, c, d)]
    zeromask = np.asarray(L.is_zero15(_regs([0, 1, P - 1])))
    assert zeromask.tolist() == [True, False, False]


def test_domain_conversions():
    rng = random.Random(8)
    xs = [0, 1, P - 1] + [rng.randrange(P) for _ in range(13)]
    xR = [x * FP.r_mod_p % P for x in xs]          # canonical R domain
    regs16 = [jnp.asarray(np.stack([int_to_limbs(v) for v in xR])[:, i])
              for i in range(16)]
    l15 = L.load15_from16(regs16)
    assert _ints(l15, mont=False) == [x * R15 % P for x in xs]
    back = L.store16_from15(l15)
    arr = np.stack([np.asarray(r) for r in back], axis=-1)
    assert [limbs_to_int(arr[k]) for k in range(len(xs))] == xR


# ---- point formulas through the L15 adapters --------------------------


def _jac(xs, ys, infs=None):
    """affine int points -> (X, Y, Z) L15Fp elements (Z = 1, or 0 at inf)."""
    B = len(xs)
    infs = infs or [False] * B
    one = [0 if i else 1 for i in infs]
    return ([_regs(xs)], [_regs(ys)], [_regs(one)])


def _unjac(Pt):
    """(X, Y, Z) L15Fp element triple -> affine int points / None."""
    X = _ints(Pt[0][0])
    Y = _ints(Pt[1][0])
    Z = _ints(Pt[2][0])
    out = []
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
            continue
        zi = pow(z, -1, P)
        out.append((x * zi * zi % P, y * zi * zi * zi % P))
    return out


def _gen_pts(ks):
    return native_bridge.g1_gen_mul_batch(ks)


@pytest.mark.parametrize("complete", [True, False])
def test_pmadd_formulas(complete):
    ka = [5, 123456789, 1, 7]
    kb = [9, 987654321, 2, 7 if complete else 11]
    pa = _gen_pts(ka)
    pb = _gen_pts(kb)
    exp = _gen_pts([x + y for x, y in zip(ka, kb)])
    if complete:
        # lane 3 is a doubling (P == Q) — only valid with complete adds
        pass
    Pj = _jac([p[0] for p in pa], [p[1] for p in pa])
    Q = ([_regs([p[0] for p in pb])], [_regs([p[1] for p in pb])])
    R = _pmadd(L.L15Fp, Pj, Q, complete)
    assert _unjac(R) == [tuple(e) for e in exp]


def test_pmadd_identity_and_negation():
    ka = [5, 21]
    pa = _gen_pts(ka)
    # P at infinity + Q -> Q (both modes)
    for complete in (True, False):
        Pinf = _jac([p[0] for p in pa], [p[1] for p in pa], infs=[True, True])
        Q = ([_regs([p[0] for p in pa])], [_regs([p[1] for p in pa])])
        R = _pmadd(L.L15Fp, Pinf, Q, complete)
        assert _unjac(R) == [tuple(p) for p in pa]
        # P + (-P) -> infinity (H = 0, r != 0 -> Z3 = 0 structurally)
        Pj = _jac([p[0] for p in pa], [p[1] for p in pa])
        Qneg = ([_regs([p[0] for p in pa])],
                [_regs([(P - p[1]) % P for p in pa])])
        R = _pmadd(L.L15Fp, Pj, Qneg, complete)
        assert _unjac(R) == [None, None]


def test_padd_and_double():
    ka = [3, 1 << 40]
    kb = [8, 77]
    pa, pb = _gen_pts(ka), _gen_pts(kb)
    Pj = _jac([p[0] for p in pa], [p[1] for p in pa])
    Qj = _jac([p[0] for p in pb], [p[1] for p in pb])
    R = _padd(L.L15Fp, Pj, Qj, True)
    assert _unjac(R) == [tuple(e) for e in
                         _gen_pts([x + y for x, y in zip(ka, kb)])]
    D = _pdouble(L.L15Fp, Pj)
    assert _unjac(D) == [tuple(e) for e in _gen_pts([2 * k for k in ka])]


def test_pmadd_g2_fp2():
    ka, kb = [4, 19], [6, 23]
    pa = native_bridge.g2_gen_mul_batch(ka)
    pb = native_bridge.g2_gen_mul_batch(kb)
    exp = native_bridge.g2_gen_mul_batch([x + y for x, y in zip(ka, kb)])

    def fp2_elem(vals):  # vals: list of (c0, c1)
        return [_regs([v[0] for v in vals]), _regs([v[1] for v in vals])]

    Pj = (fp2_elem([p[0] for p in pa]), fp2_elem([p[1] for p in pa]),
          fp2_elem([(1, 0)] * len(ka)))
    Q = (fp2_elem([p[0] for p in pb]), fp2_elem([p[1] for p in pb]))
    R = _pmadd(L.L15Fp2, Pj, Q, True)
    X = [_ints(c) for c in R[0]]
    Y = [_ints(c) for c in R[1]]
    Z = [_ints(c) for c in R[2]]
    for i in range(len(ka)):
        z = (Z[0][i], Z[1][i])
        # Fp2 inverse: (a - bu)/(a^2 + b^2)
        n = pow((z[0] * z[0] + z[1] * z[1]) % P, -1, P)
        zi = (z[0] * n % P, (P - z[1]) * n % P)
        zi2 = ((zi[0] * zi[0] - zi[1] * zi[1]) % P,
               2 * zi[0] * zi[1] % P)
        zi3 = ((zi2[0] * zi[0] - zi2[1] * zi[1]) % P,
               (zi2[0] * zi[1] + zi2[1] * zi[0]) % P)
        x = (X[0][i], X[1][i])
        y = (Y[0][i], Y[1][i])
        xa = ((x[0] * zi2[0] - x[1] * zi2[1]) % P,
              (x[0] * zi2[1] + x[1] * zi2[0]) % P)
        ya = ((y[0] * zi3[0] - y[1] * zi3[1]) % P,
              (y[0] * zi3[1] + y[1] * zi3[0]) % P)
        assert (list(xa), list(ya)) == \
            ([exp[i][0][0], exp[i][0][1]], [exp[i][1][0], exp[i][1][1]])
