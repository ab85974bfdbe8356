"""Batched BN254 optimal-ate pairing on TPU.

Mirrors the validated Python reference (``refimpl/pairing_ref.py``) with all
arithmetic on batched limb arrays: Miller loop as a `lax.scan` over the
static 6x+2 bit string (double-step always, add-step under the scanned bit),
line evaluations in affine G2 with batched Fp2 inversions, sparse
l0+l1*w+l3*w^3 multiplications, and the final exponentiation as a scan over
the fixed (p^12-1)/r exponent bits.

This is the compute core of batched Groth16 verification
(configs[2] in BASELINE.json): hundreds of proofs verify in one batch at
the cost of one serial pairing schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.bn254 import FP_MOD as P, FR_MOD, BN_X
from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.curve import tower as tw
from tpu_zkpool.refimpl import pairing_ref as pr

ATE_BITS = [int(b) for b in bin(6 * BN_X + 2)[3:]]  # MSB dropped
FINAL_EXP = (P**12 - 1) // FR_MOD


def _f2_const(x) -> tuple:
    """Host Fp2 constant -> Montgomery limb pair (broadcastable)."""
    return (jnp.asarray(FP.to_mont([x[0]])[0]), jnp.asarray(FP.to_mont([x[1]])[0]))


_XI_P_13 = _f2_const(pr._XI_P_13)
_XI_P_12 = _f2_const(pr._XI_P_12)


def _line(t, q, px, py, is_double: bool):
    """Line through t,q (affine Fp2 points) evaluated at (px, py) in G1.

    Returns (new_t, (l0, l1, l3)). Batched; caller guarantees the
    non-degenerate case (valid subgroup inputs during the Miller loop).
    """
    tx, ty = t
    qx, qy = q
    if is_double:
        num = tw.f2_scalar_small(tw.f2_sqr(tx), 3)
        den = tw.f2_add(ty, ty)
    else:
        num = tw.f2_sub(qy, ty)
        den = tw.f2_sub(qx, tx)
    lam = tw.f2_mul(num, tw.f2_inv(den))
    x3 = tw.f2_sub(tw.f2_sub(tw.f2_sqr(lam), tx), qx)
    y3 = tw.f2_sub(tw.f2_mul(lam, tw.f2_sub(tx, x3)), ty)
    l0 = (py, FP.zeros(py.shape[:-1]))
    l1 = tw.f2_neg((FP.mont_mul(lam[0], px), FP.mont_mul(lam[1], px)))
    l3 = tw.f2_sub(tw.f2_mul(lam, tx), ty)
    return (x3, y3), (l0, l1, l3)


def _g2_frobenius(q):
    x, y = q
    return (tw.f2_mul(tw.f2_conj(x), _XI_P_13),
            tw.f2_mul(tw.f2_conj(y), _XI_P_12))


def miller_loop(px, py, qx, qy):
    """f_{6x+2,Q}(P) with Frobenius end-steps.

    px, py: uint32[..., 16] G1 affine (Montgomery).
    qx, qy: Fp2 pairs of the same batch shape. Returns a batched Fp12.
    """
    bits = jnp.asarray(ATE_BITS, dtype=jnp.uint32)
    bshape = px.shape[:-1]
    f0 = tw.f12_one(bshape)
    q = (qx, qy)

    def body(carry, bit):
        f, t = carry
        f = tw.f12_sqr(f)
        t, (l0, l1, l3) = _line(t, t, px, py, True)
        f = tw.f12_mul_sparse_line(f, l0, l1, l3)

        t_add, (a0, a1, a3) = _line(t, q, px, py, False)
        f_add = tw.f12_mul_sparse_line(f, a0, a1, a3)
        take = (bit == 1)

        def sel2(a, b):
            return jnp.where(take[..., None] if take.ndim else take, a, b)

        f = tuple((sel2(x[0], y[0]), sel2(x[1], y[1]))
                  for x, y in zip(f_add, f))
        t = tuple((sel2(x[0], y[0]), sel2(x[1], y[1]))
                  for x, y in zip(t_add, t))
        return (f, t), None

    (f, t), _ = jax.lax.scan(body, (f0, q), bits)

    q1 = _g2_frobenius(q)
    q2 = _g2_frobenius(q1)
    q2 = (q2[0], tw.f2_neg(q2[1]))
    t, (l0, l1, l3) = _line(t, q1, px, py, False)
    f = tw.f12_mul_sparse_line(f, l0, l1, l3)
    t, (l0, l1, l3) = _line(t, q2, px, py, False)
    f = tw.f12_mul_sparse_line(f, l0, l1, l3)
    return f


def f12_pow_const(a, e: int):
    """a^e for a fixed Python-int exponent via a bit scan (MSB first)."""
    bits = jnp.asarray([int(b) for b in bin(e)[2:]], dtype=jnp.uint32)

    def body(acc, bit):
        acc = tw.f12_sqr(acc)
        mul = tw.f12_mul(acc, a)
        take = (bit == 1)
        acc = tuple(
            (jnp.where(take, x[0], y[0]), jnp.where(take, x[1], y[1]))
            for x, y in zip(mul, acc)
        )
        return acc, None

    out, _ = jax.lax.scan(body, tw.f12_one(a[0][0].shape[:-1]), bits)
    return out


# ------------------------------------------------ fast final exponentiation
# Device port of refimpl.pairing_ref.final_exponentiation_fast (verified
# there against the naive (p^12-1)/r power): easy part into the cyclotomic
# subgroup, Granger-Scott squarings, Scott-et-al. hard-part chain. ~25x
# less Fp12 work than the blind 3050-bit scan — batched Groth16 verify is
# final-exp-dominated, so this is the verify-throughput lever.

_GAMMA = {k: tuple(_f2_const(g) for g in pr._gamma(k)) for k in (1, 2, 3)}


def f12_frobenius(a, power: int):
    g = _GAMMA[power]
    out = []
    for i in range(6):
        c = tw.f2_conj(a[i]) if power % 2 else a[i]
        out.append(tw.f2_mul(c, g[i]))
    return tuple(out)


def f12_inv(a):
    """Batched Fp12 inverse via the even-subalgebra trick: a * conj(a) is
    even in w (an Fp6 element over v = w^2, v^3 = xi), which inverts in
    closed form; then a^-1 = conj(a) * (a * conj(a))^-1."""
    c = tw.f12_conj(a)
    n = tw.f12_mul(a, c)
    g0, g1, g2 = n[0], n[2], n[4]
    c0 = tw.f2_sub(tw.f2_sqr(g0), tw.f2_mul_by_xi(tw.f2_mul(g1, g2)))
    c1 = tw.f2_sub(tw.f2_mul_by_xi(tw.f2_sqr(g2)), tw.f2_mul(g0, g1))
    c2 = tw.f2_sub(tw.f2_sqr(g1), tw.f2_mul(g0, g2))
    den = tw.f2_add(
        tw.f2_mul(g0, c0),
        tw.f2_mul_by_xi(tw.f2_add(tw.f2_mul(g2, c1), tw.f2_mul(g1, c2))))
    di = tw.f2_inv(den)
    z = tw.f2_zero(c0[0].shape[:-1])
    ginv = (tw.f2_mul(c0, di), z, tw.f2_mul(c1, di), z,
            tw.f2_mul(c2, di), z)
    return tw.f12_mul(c, ginv)


def f12_cyclotomic_sqr(a):
    """Granger-Scott squaring (cyclotomic subgroup only); see
    refimpl.pairing_ref.f12_cyclotomic_sqr for the Fp4 derivation."""
    def fp4_sqr(x, y):
        x2 = tw.f2_sqr(x)
        y2 = tw.f2_sqr(y)
        return (tw.f2_add(x2, tw.f2_mul_by_xi(y2)),
                tw.f2_sub(tw.f2_sub(tw.f2_sqr(tw.f2_add(x, y)), x2), y2))

    t0, t1 = fp4_sqr(a[0], a[3])
    t2, t3 = fp4_sqr(a[1], a[4])
    t4, t5 = fp4_sqr(a[2], a[5])

    def tm2(t, c):
        return tw.f2_sub(tw.f2_add(tw.f2_add(t, t), t), tw.f2_add(c, c))

    def tp2(t, c):
        return tw.f2_add(tw.f2_add(tw.f2_add(t, t), t), tw.f2_add(c, c))

    return (tm2(t0, a[0]), tp2(tw.f2_mul_by_xi(t5), a[1]), tm2(t2, a[2]),
            tp2(t1, a[3]), tm2(t4, a[4]), tp2(t3, a[5]))


# The hard part runs as a REGISTER PROGRAM under one lax.scan: a static op
# list (mul / cyclotomic-sqr / frobenius / conj / mov over a 15-register
# Fp12 file) built once in Python. The traced graph holds exactly ONE
# instance of each op (lax.switch executes just the selected branch per
# step), so compile time stays near the single-op cost — the unrolled
# Scott chain (~20 f12_mul instances) sent XLA-CPU's simplifier into
# minutes-to-hours territory, the same pathology fields/fctx.py documents.

_MUL, _SQR, _FROB, _CONJ, _MOV = range(5)
_FE_NREG = 15
_FE_OUT = 14


def _fe_program():
    """Static (kind, a, b, dst) list: everything after inv(f).
    r0 = f, r1 = inv(f) on entry; result lands in r14."""
    ops = []

    def emit(kind, a, b, dst):
        ops.append((kind, a, b, dst))

    def pow_x(src, dst):
        emit(_MOV, src, 0, dst)
        for ch in bin(BN_X)[3:]:
            emit(_SQR, dst, 0, dst)
            if ch == "1":
                emit(_MUL, dst, src, dst)

    # easy part: m = frob2(f^(p^6-1)) * f^(p^6-1)
    emit(_CONJ, 0, 0, 2)
    emit(_MUL, 2, 1, 2)          # r2 = conj(f) * inv(f) = f^(p^6-1)
    emit(_FROB, 2, 2, 1)         # r1 = r2^(p^2)
    emit(_MUL, 1, 2, 2)          # r2 = m
    # x-power ladder
    pow_x(2, 3)                  # r3 = fx
    pow_x(3, 4)                  # r4 = fx2
    pow_x(4, 5)                  # r5 = fx3
    # y terms
    emit(_FROB, 2, 1, 6)         # r6 = m^p
    emit(_FROB, 2, 2, 7)         # r7 = m^(p^2)
    emit(_MUL, 6, 7, 6)
    emit(_FROB, 2, 3, 7)         # r7 = m^(p^3)
    emit(_MUL, 6, 7, 6)          # r6 = y0
    emit(_CONJ, 2, 0, 7)         # r7 = y1
    emit(_FROB, 4, 2, 8)         # r8 = y2
    emit(_FROB, 3, 1, 9)
    emit(_CONJ, 9, 0, 9)         # r9 = y3
    emit(_FROB, 4, 1, 10)
    emit(_MUL, 3, 10, 10)
    emit(_CONJ, 10, 0, 10)       # r10 = y4
    emit(_CONJ, 4, 0, 11)        # r11 = y5
    emit(_FROB, 5, 1, 12)
    emit(_MUL, 5, 12, 12)
    emit(_CONJ, 12, 0, 12)       # r12 = y6
    # Scott et al. combine
    emit(_SQR, 12, 0, 12)        # T0 = y6^2
    emit(_MUL, 12, 10, 12)       # * y4
    emit(_MUL, 12, 11, 12)       # * y5
    emit(_MUL, 9, 11, 13)        # T1 = y3 * y5
    emit(_MUL, 13, 12, 13)       # * T0
    emit(_MUL, 12, 8, 12)        # T0 *= y2
    emit(_SQR, 13, 0, 13)
    emit(_MUL, 13, 12, 13)
    emit(_SQR, 13, 0, 13)
    emit(_MUL, 13, 7, 14)        # T0' = T1 * y1
    emit(_MUL, 13, 6, 13)        # T1 *= y0
    emit(_SQR, 14, 0, 14)
    emit(_MUL, 14, 13, 14)       # result -> r14
    return np.asarray(ops, dtype=np.int32)


def _pack12(a):
    """Fp12 tuple-of-pairs -> uint32[6, 2, ..., 16]."""
    return jnp.stack([jnp.stack(c, axis=0) for c in a], axis=0)


def _unpack12(arr):
    return tuple((arr[i, 0], arr[i, 1]) for i in range(6))


def f12_pow_x_cyclo(a):
    """a^BN_X via a bit scan with cyclotomic squarings (BN_X has MSB 1,
    so seed the accumulator with `a` and scan the remaining bits)."""
    bits = jnp.asarray([int(b) for b in bin(BN_X)[3:]], dtype=jnp.uint32)

    def body(acc, bit):
        acc = f12_cyclotomic_sqr(acc)
        mul = tw.f12_mul(acc, a)
        take = (bit == 1)
        acc = tuple(
            (jnp.where(take, x[0], y[0]), jnp.where(take, x[1], y[1]))
            for x, y in zip(mul, acc)
        )
        return acc, None

    out, _ = jax.lax.scan(body, a, bits)
    return out


_GAMMA_TABLE = None  # uint32[3, 6, 2, 16], lazily built


def _gamma_table():
    global _GAMMA_TABLE
    if _GAMMA_TABLE is None:
        rows = []
        for k in (1, 2, 3):
            g = _GAMMA[k]
            rows.append([[np.asarray(c0), np.asarray(c1)] for c0, c1 in g])
        _GAMMA_TABLE = jnp.asarray(np.asarray(rows, dtype=np.uint32))
    return _GAMMA_TABLE


def final_exponentiation(f):
    """f^((p^12-1)/r): easy part + Scott et al. hard part (exact value,
    matching the refimpl oracle bit-for-bit; program-scan formulation)."""
    finv = f12_inv(f)
    bshape = f[0][0].shape[:-1]
    zero = tw.f12_conj(tw.f12_one(bshape))  # any placeholder; registers
    R0 = jnp.stack([_pack12(f), _pack12(finv)]
                   + [_pack12(zero)] * (_FE_NREG - 2), axis=0)
    gamma = _gamma_table()
    ops = jnp.asarray(_fe_program())

    def body(R, op):
        kind, a, b, dst = op[0], op[1], op[2], op[3]
        A = _unpack12(jnp.take(R, a, axis=0))
        B = _unpack12(jnp.take(R, b, axis=0))

        def do_mul():
            return _pack12(tw.f12_mul(A, B))

        def do_sqr():
            return _pack12(f12_cyclotomic_sqr(A))

        def do_frob():
            # b = power (1..3); conj odd-power coefficients, then gamma.
            g = jnp.take(gamma, b - 1, axis=0)      # (6, 2, 16)
            odd = (b % 2) == 1
            out = []
            for i in range(6):
                c0, c1 = A[i]
                c1 = jnp.where(odd, jnp.asarray(FP.neg(c1)), c1)
                gi = (g[i, 0], g[i, 1])
                out.append(tw.f2_mul((c0, c1), gi))
            return _pack12(tuple(out))

        def do_conj():
            return _pack12(tw.f12_conj(A))

        def do_mov():
            return _pack12(A)

        new = jax.lax.switch(kind, (do_mul, do_sqr, do_frob, do_conj,
                                    do_mov))
        return R.at[dst].set(new), None

    R, _ = jax.lax.scan(body, R0, ops)
    return _unpack12(R[_FE_OUT])


def pairing_product_is_one(g1_points, g2_points) -> jnp.ndarray:
    """Batched check prod_i e(P_i, Q_i) == 1.

    g1_points: list of (px, py) uint32[..., 16]; g2_points: matching list of
    Fp2 affine pairs. Returns bool[...]. Jitted (pytree args): the Miller
    loops + final exponentiation compile to one device program instead of
    dispatching thousands of eager limb ops through the runtime.

    On the TPU backend the module replays from the ``utils/aot.py``
    export cache — re-tracing the Miller/final-exp scans cost minutes per
    process and dominated the batched-verify wall (bench round 4:
    620 s with the XLA executable itself already compile-cached).
    """
    args = (tuple(g1_points), tuple(g2_points))
    if jax.default_backend() != "cpu":
        from tpu_zkpool.utils import aot
        if aot.enabled():
            sds = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
                args)
            fn = aot.cached_call("ppio", _ppio_jit, (sds[0], sds[1]))
            return fn(*args)
    return _ppio_jit(*args)


@jax.jit
def _ppio_jit(g1_points, g2_points):
    f = None
    for (px, py), q in zip(g1_points, g2_points):
        ml = miller_loop(px, py, q[0], q[1])
        f = ml if f is None else tw.f12_mul(f, ml)
    return tw.f12_eq_one(final_exponentiation(f))


# ----------------------------------------------------------- host helpers

def g1_to_limbs(pts):
    xs = FP.to_mont(np.asarray([p[0] for p in pts], dtype=object))
    ys = FP.to_mont(np.asarray([p[1] for p in pts], dtype=object))
    return jnp.asarray(xs), jnp.asarray(ys)


def g2_to_limbs(pts):
    def col(i, j):
        return jnp.asarray(FP.to_mont(
            np.asarray([p[i][j] for p in pts], dtype=object)))
    return ((col(0, 0), col(0, 1)), (col(1, 0), col(1, 1)))


# ------------------------------------------- precomputed-line multi-pairing

def _line_eval(f, px, py, an, b):
    """f *= line with precomputed coefficients: l0 = py, l1 = alpha_neg*px,
    l3 = beta (lines.py) — two Fp muls + one sparse Fp12 product."""
    l0 = (py, FP.zeros(py.shape[:-1]))
    l1 = (FP.mont_mul(an[0], px), FP.mont_mul(an[1], px))
    return tw.f12_mul_sparse_line(f, l0, l1, b)


def miller_loop_lines(g1s, legs):
    """Multi-pairing Miller loop over precomputed line coefficients.

    g1s: list of (px, py) uint32[..., 16] Montgomery G1 affine points;
    legs: matching list of ``lines.LineArrays`` (step axis leading; fixed
    legs unbatched, per-proof legs batched — leading G1 axes broadcast).
    One shared Fp12 squaring chain serves every leg, and the device does
    no G2 arithmetic and no Fp2 inversions (VERDICT r2: the per-step
    Fermat inverses were ~80% of the naive loop's op count).
    """
    bits = jnp.asarray(ATE_BITS, dtype=jnp.uint32)
    bshape = jnp.broadcast_shapes(*[p[0].shape[:-1] for p in g1s])
    f0 = tw.f12_one(bshape)
    dbl = tuple((lg.dbl_an0, lg.dbl_an1, lg.dbl_b0, lg.dbl_b1) for lg in legs)
    add = tuple((lg.add_an0, lg.add_an1, lg.add_b0, lg.add_b1) for lg in legs)

    def body(f, xs):
        bit, dstep, astep = xs
        f = tw.f12_sqr(f)
        for (px, py), (an0, an1, b0, b1) in zip(g1s, dstep):
            f = _line_eval(f, px, py, (an0, an1), (b0, b1))
        fa = f
        for (px, py), (an0, an1, b0, b1) in zip(g1s, astep):
            fa = _line_eval(fa, px, py, (an0, an1), (b0, b1))
        take = bit == 1
        f = tuple((jnp.where(take, a0, c0), jnp.where(take, a1, c1))
                  for (a0, a1), (c0, c1) in zip(fa, f))
        return f, None

    f, _ = jax.lax.scan(body, f0, (bits, dbl, add))
    for i in range(2):
        for (px, py), lg in zip(g1s, legs):
            f = _line_eval(f, px, py, (lg.end_an0[i], lg.end_an1[i]),
                           (lg.end_b0[i], lg.end_b1[i]))
    return f


def f12_to_limbs(f):
    """Host Fp12 (6 Fp2 int pairs, pairing_ref layout) -> Montgomery limbs."""
    return tuple((jnp.asarray(FP.to_mont([c[0]])[0]),
                  jnp.asarray(FP.to_mont([c[1]])[0])) for c in f)


def _f12_eq(a, b):
    ok = None
    for (c0, c1), (o0, o1) in zip(a, b):
        e = FP.eq(c0, o0) & FP.eq(c1, o1)
        ok = e if ok is None else ok & e
    return ok


@jax.jit
def _ppl_jit(g1s, legs, target):
    fe = final_exponentiation(miller_loop_lines(g1s, legs))
    return _f12_eq(fe, target)


def pairing_lines_equal(g1_points, legs, target=None) -> jnp.ndarray:
    """Batched check prod_i e(P_i, Q_i) == target with precomputed Q lines.

    target: host Fp12 (pairing_ref layout) or None for 1 — e.g. the per-VK
    constant e(alpha, beta) that replaces a whole Miller-loop leg in
    Groth16 verification. Returns bool[batch].

    On the TPU backend the module replays from the ``utils/aot.py``
    export cache (same rationale as ``pairing_product_is_one``: the
    Miller/final-exp scans cost minutes of per-process tracing).
    """
    tl = f12_to_limbs(target) if target is not None \
        else tw.f12_one(())
    args = (tuple(g1_points), tuple(legs), tl)
    if jax.default_backend() != "cpu":
        from tpu_zkpool.utils import aot
        if aot.enabled():
            sds = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a),
                                               jnp.asarray(a).dtype), args)
            fn = aot.cached_call("ppl", _ppl_jit, sds)
            return fn(*args)
    return _ppl_jit(*args)
