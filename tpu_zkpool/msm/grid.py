"""Grid-accumulator Pallas MSM — the speed-of-light Pippenger path.

Replaces the gnark MSM the reference shells out to inside ``sunspot prove``
(``/root/reference/client/proof.helper.ts:64``; SURVEY.md §2.3) with a fully
on-chip pipeline. Round 1's formulation was correct but dispatch-bound: the
bucket/Horner stages ran thousands of tiny serial XLA steps. Here every
serial phase is ONE ``pallas_call`` whose grid steps carry a VMEM scratch
accumulator (TPU grids execute sequentially), so the only serial cost is
in-kernel compute:

1. signed window digits (on device, from 16-bit scalar limbs),
2. per window: sort points by |digit| (one batched XLA argsort + gather),
3. bucket sums via a chunk-contiguous inclusive prefix scan: 1024 chunks in
   the lanes of an (8, 128) tile, ``k = N/1024`` sequential grid steps of
   1024-wide mixed Jacobian+affine complete adds — the O(N) bulk,
4. cross-chunk prefix (two 32-step levels, windows batched into lanes),
   bucket values from boundary differences (searchsorted + gather),
5. bucket reduction sum_j j*B_j via the running-sum identity, batched over
   (window, bucket-chunk) lanes in a weighted-suffix kernel,
6. Horner window combine with in-kernel doublings.

The point formulas are written once, generic over a field adapter (Fp for
G1, Fp2 for the Groth16 B-leg's G2 MSM) and over the element type: Pallas
kernels use register-limb elements (lists of 16 (8, 128) uint32 registers,
the ``hash/poseidon_pallas.py`` layout); the ``XlaBackend`` uses plain
``uint32[..., ncomp, 16]`` arrays with the scan-based ``fields/fctx`` ops.
The XLA backend exists because Mosaic is TPU-only and XLA-CPU chokes on the
unrolled limb graphs (minutes-to-hours of algebraic-simplifier time): CPU
tests and the virtual-mesh multichip dryrun run the identical pipeline with
``backend="xla"``; real-TPU runs use ``backend="pallas"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.fields.limbs import NLIMB, MASK, WBITS, int_to_limbs
from tpu_zkpool.hash.poseidon_pallas import TILE, TILE_N, _mont_mul, _add_mod
from tpu_zkpool.curve.curve_pallas import _sub_mod, _dbl_mod, _is_zero
from tpu_zkpool.curve import limb15 as l15

_PJ = [np.uint32(v) for v in FP.p_limbs]
_N0 = np.uint32(FP.n0)
_R1 = [np.uint32(v) for v in int_to_limbs(FP.r_mod_p)]  # Montgomery 1

SCALAR_BITS = 255  # BN254 Fr < 2^254; one guard bit for the signed recode


# --------------------------------------------------------------------------
# Field adapters. Kernel flavor: element = [component]*ncomp, component =
# [reg]*NLIMB with reg an (8, 128) uint32 array. XLA flavor: element =
# uint32[..., ncomp, NLIMB] array.
# --------------------------------------------------------------------------


class _Fp:
    ncomp = 1

    @staticmethod
    def mul(a, b):
        return [_mont_mul(a[0], b[0], _PJ, _N0)]

    @staticmethod
    def sqr(a):
        return _Fp.mul(a, a)

    @staticmethod
    def add(a, b):
        return [_add_mod(a[0], b[0], _PJ)]

    @staticmethod
    def sub(a, b):
        return [_sub_mod(a[0], b[0])]

    @staticmethod
    def dbl(a):
        return [_dbl_mod(a[0])]

    @staticmethod
    def is_zero(a):
        return _is_zero(a[0])

    @staticmethod
    def zero(like):
        return [[jnp.zeros_like(r) for r in like[0]]]

    @staticmethod
    def one(like):
        return [[jnp.full_like(r, _R1[l]) for l, r in enumerate(like[0])]]

    @staticmethod
    def select(cond, a, b):
        return [[jnp.where(cond, x, y) for x, y in zip(ca, cb)]
                for ca, cb in zip(a, b)]

    @staticmethod
    def mul_sub(a, b, c, d):
        return _Fp.sub(_Fp.mul(a, b), _Fp.mul(c, d))


class _Fp2:
    """Fp2 = Fp[u]/(u^2 + 1); Karatsuba multiplication (3 Fp muls)."""

    ncomp = 2

    @staticmethod
    def mul(a, b):
        t0 = _mont_mul(a[0], b[0], _PJ, _N0)
        t1 = _mont_mul(a[1], b[1], _PJ, _N0)
        sa = _add_mod(a[0], a[1], _PJ)
        sb = _add_mod(b[0], b[1], _PJ)
        t2 = _mont_mul(sa, sb, _PJ, _N0)
        return [_sub_mod(t0, t1), _sub_mod(_sub_mod(t2, t0), t1)]

    @staticmethod
    def sqr(a):
        return _Fp2.mul(a, a)

    @staticmethod
    def add(a, b):
        return [_add_mod(x, y, _PJ) for x, y in zip(a, b)]

    @staticmethod
    def sub(a, b):
        return [_sub_mod(x, y) for x, y in zip(a, b)]

    @staticmethod
    def dbl(a):
        return [_dbl_mod(x) for x in a]

    @staticmethod
    def is_zero(a):
        return _is_zero(a[0]) & _is_zero(a[1])

    @staticmethod
    def zero(like):
        return [[jnp.zeros_like(r) for r in c] for c in like]

    @staticmethod
    def one(like):
        return [[jnp.full_like(r, _R1[l]) for l, r in enumerate(like[0])],
                [jnp.zeros_like(r) for r in like[1]]]

    @staticmethod
    def select(cond, a, b):
        return [[jnp.where(cond, x, y) for x, y in zip(ca, cb)]
                for ca, cb in zip(a, b)]

    @staticmethod
    def mul_sub(a, b, c, d):
        return _Fp2.sub(_Fp2.mul(a, b), _Fp2.mul(c, d))


def _field(ncomp):
    return _Fp if ncomp == 1 else _Fp2


class _XFp:
    """XLA array adapter: element = uint32[..., 1, 16] (Montgomery)."""

    ncomp = 1

    mul = staticmethod(lambda a, b: FP.mont_mul(a, b))
    sqr = staticmethod(lambda a: FP.mont_mul(a, a))
    add = staticmethod(lambda a, b: FP.add(a, b))
    sub = staticmethod(lambda a, b: FP.sub(a, b))
    dbl = staticmethod(lambda a: FP.add(a, a))

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-1, -2))

    zero = staticmethod(jnp.zeros_like)

    @staticmethod
    def one(like):
        one = jnp.asarray(np.asarray(_R1, dtype=np.uint32))
        out = jnp.zeros_like(like)
        return out.at[..., 0, :].set(jnp.broadcast_to(
            one, like[..., 0, :].shape))

    @staticmethod
    def select(cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    @staticmethod
    def mul_sub(a, b, c, d):
        return _XFp.sub(_XFp.mul(a, b), _XFp.mul(c, d))


class _XFp2(_XFp):
    """XLA array adapter: element = uint32[..., 2, 16]; u^2 = -1.

    add/sub/dbl/zero/select are componentwise and inherited; only mul/sqr
    need the Fp2 structure (Karatsuba on the component planes).
    """

    ncomp = 2

    @staticmethod
    def mul(a, b):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = FP.mont_mul(a0, b0)
        t1 = FP.mont_mul(a1, b1)
        t2 = FP.mont_mul(FP.add(a0, a1), FP.add(b0, b1))
        return jnp.stack(
            [FP.sub(t0, t1), FP.sub(FP.sub(t2, t0), t1)], axis=-2)

    @staticmethod
    def sqr(a):
        return _XFp2.mul(a, a)

    @staticmethod
    def mul_sub(a, b, c, d):
        return _XFp.sub(_XFp2.mul(a, b), _XFp2.mul(c, d))


def _xfield(ncomp):
    return _XFp if ncomp == 1 else _XFp2


# --------------------------------------------------------------------------
# Generic Jacobian point math (a = 0 curves) — shared by both element types.
# --------------------------------------------------------------------------


def _pdouble(F, P):
    X, Y, Z = P
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    xb = F.add(X, B)
    D = F.dbl(F.sub(F.sub(F.sqr(xb), A), C))
    E = F.add(F.dbl(A), A)
    Fq = F.sqr(E)
    X3 = F.sub(Fq, F.dbl(D))
    C8 = F.dbl(F.dbl(F.dbl(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    Z3 = F.dbl(F.mul(Y, Z))
    return X3, Y3, Z3


def _finish(F, P, Q, X3, Y3, Z3, H, r, complete, q_affine=False):
    """Shared special-case selects. ``complete=False`` is prover mode: the
    doubling branch (P == Q, probability ~2^-254 for honest MSM inputs;
    an adversarial prover only invalidates their own proof) is skipped —
    P == -Q still lands on the identity automatically since Z3 = Z1*Z2*H
    = 0. Identity operands are always handled."""
    p_inf = F.is_zero(P[2])
    q_inf = None if q_affine else F.is_zero(Q[2])
    out = []
    if complete:
        same_x = F.is_zero(H)
        same_y = F.is_zero(r)
        dbl = _pdouble(F, P)
        finite = ~p_inf if q_inf is None else (~p_inf & ~q_inf)
        is_dbl = same_x & same_y & finite
        to_inf = same_x & ~same_y & finite
        zero = F.zero(P[0])
    if q_affine:
        one = F.one(P[0])
        q_jac = (Q[0], Q[1], one)
    else:
        q_jac = Q
    for i, v in enumerate((X3, Y3, Z3)):
        if complete:
            v = F.select(is_dbl, dbl[i], v)
            v = F.select(to_inf, zero, v)
        v = F.select(p_inf, q_jac[i], v)
        if q_inf is not None:
            v = F.select(q_inf, P[i], v)
        out.append(v)
    return tuple(out)


def _pmadd(F, P, Q, complete=True):
    """P (Jacobian) + Q ((X2, Y2) affine, implicit Z2 = 1). Identity/padding
    INPUT points are not representable — the pipeline zeroes their window
    digits instead (bucket 0 is never read), so every Q is a valid curve
    point. 8M + 3S (+ dbl branch when complete)."""
    X1, Y1, Z1 = P
    X2, Y2 = Q[0], Q[1]
    Z1Z1 = F.sqr(Z1)
    U2 = F.mul(X2, Z1Z1)
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, X1)
    r = F.sub(S2, Y1)
    HH = F.sqr(H)
    HHH = F.mul(H, HH)
    V = F.mul(X1, HH)
    X3 = F.sub(F.sub(F.sqr(r), HHH), F.dbl(V))
    Y3 = F.mul_sub(r, F.sub(V, X3), Y1, HHH)
    Z3 = F.mul(Z1, H)
    return _finish(F, P, Q, X3, Y3, Z3, H, r, complete, q_affine=True)


def _padd(F, P, Q, complete=True):
    """General Jacobian addition (12M + 4S + dbl branch when complete)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    r = F.sub(S2, S1)
    HH = F.sqr(H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    X3 = F.sub(F.sub(F.sqr(r), HHH), F.dbl(V))
    Y3 = F.mul_sub(r, F.sub(V, X3), S1, HHH)
    Z3 = F.mul(F.mul(Z1, Z2), H)
    return _finish(F, P, Q, X3, Y3, Z3, H, r, complete)


# --------------------------------------------------------------------------
# Pallas kernels. Tile layout: (3, ncomp, NLIMB, 8, 128); "rows" =
# uint32[n, 3, ncomp, NLIMB].
# --------------------------------------------------------------------------


def _load(ref, ncomp, ncoord=3, nlimb=NLIMB):
    return tuple(
        [[ref[c, q, l] for l in range(nlimb)] for q in range(ncomp)]
        for c in range(ncoord)
    )


def _store(ref, P, ncomp, nlimb=NLIMB):
    for c in range(3):
        for q in range(ncomp):
            for l in range(nlimb):
                ref[c, q, l] = P[c][q][l]


def _zero_ref(ref):
    ref[...] = jnp.zeros(ref.shape, ref.dtype)


def _make_prefix_kernel(ncomp, mixed, complete, limb15=False):
    """The O(N) bulk kernel. With ``limb15=True`` the running accumulator
    lives in the 17x15-bit R' = 2^255 Montgomery domain (curve/limb15.py:
    grouped product splits, dedicated squaring, fused Y3) — streamed-in
    coordinates are halved+regrouped on load and the emitted prefix is
    doubled back to the canonical 16x16-bit R domain on store."""
    F = l15.field15(ncomp) if limb15 else _field(ncomp)
    addf = _pmadd if mixed else _padd
    nl = l15.NL if limb15 else NLIMB

    def kernel(in_ref, out_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            _zero_ref(acc_ref)

        P = _load(acc_ref, ncomp, nlimb=nl)
        Q = _load(in_ref.at[0], ncomp, 2 if mixed else 3)
        if limb15:
            Q = tuple([l15.load15_from16(comp) for comp in coord]
                      for coord in Q)
        R = addf(F, P, Q, complete)
        _store(acc_ref, R, ncomp, nlimb=nl)
        if limb15:
            R = tuple([l15.store16_from15(comp) for comp in coord]
                      for coord in R)
        _store(out_ref.at[0], R, ncomp)

    return kernel


def _make_prefix_rows_kernel(ncomp, complete, limb15=False):
    """Rows-in flavor of the mixed prefix kernel: consumes CONTIGUOUS
    row-major blocks (lanes, 2*ncomp*NLIMB) of gathered affine points plus
    a per-lane sign plane, transposing to limb planes IN VMEM (one
    jnp.transpose per step, measured ~free — scripts/retile_prof.py). This
    removes the XLA scan-tile transpose that dominated the MSM at 2^20
    (22 ns/row even behind an optimization barrier: layout assignment
    element-izes the gather+transpose pair)."""
    F = l15.field15(ncomp) if limb15 else _field(ncomp)
    nl = l15.NL if limb15 else NLIMB

    def kernel(in_ref, sg_ref, out_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            _zero_ref(acc_ref)

        lanes = in_ref.shape[1]
        nt = lanes // TILE_N
        TT = jnp.transpose(in_ref[0])            # (2*ncomp*NLIMB, lanes)

        def plane(c, q, m):
            return TT[(c * ncomp + q) * NLIMB + m].reshape(nt, *TILE)

        Q = tuple([[plane(c, q, m) for m in range(NLIMB)]
                   for q in range(ncomp)] for c in range(2))
        if limb15:
            Q = tuple([l15.load15_from16(comp) for comp in coord]
                      for coord in Q)
        sign = sg_ref[0] != 0                    # (nt, 8, 128)
        Qy = Q[1]
        Q = (Q[0], F.select(sign, F.sub(F.zero(Qy), Qy), Qy))
        P = _load(acc_ref, ncomp, nlimb=nl)
        R = _pmadd(F, P, Q, complete)
        _store(acc_ref, R, ncomp, nlimb=nl)
        if limb15:
            R = tuple([l15.store16_from15(comp) for comp in coord]
                      for coord in R)
        _store(out_ref.at[0], R, ncomp)

    return kernel


def _prefix_rows_in(rows_t, signs_t, complete, interpret=False,
                    limb15=False):
    """rows_t: uint32[k, lanes, 2*ncomp*NLIMB] — step-major gathered
    affine rows (row [j, l] = sorted position l*k + j); signs_t:
    uint32[k, nt, 8, 128] per-lane Y-negation flags. Returns the same
    tiled inclusive-prefix layout as ``_prefix_tiles`` so the downstream
    boundary stages are unchanged."""
    k, lanes, words = rows_t.shape
    ncomp = words // (2 * NLIMB)
    nt = lanes // TILE_N
    nl = l15.NL if limb15 else NLIMB
    out_blk = (1, 3, ncomp, NLIMB, nt) + TILE
    return pl.pallas_call(
        _make_prefix_rows_kernel(ncomp, complete, limb15),
        grid=(k,),
        in_specs=[pl.BlockSpec((1, lanes, words), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nt) + TILE, lambda j: (j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_blk, lambda j: (j, 0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (k, 3, ncomp, NLIMB, nt) + TILE, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((3, ncomp, nl, nt) + TILE, jnp.uint32)],
        interpret=interpret,
    )(rows_t, signs_t)


def _prefix_tiles(tiles, mixed, complete, interpret=False, limb15=False):
    """tiles: uint32[k, C, ncomp, NLIMB, nt, 8, 128] with C = 2 (affine
    X/Y, mixed path — identity inputs are excluded by digit-zeroing) or 3
    (Jacobian). Grid step j adds tile j into a persistent per-lane
    accumulator and emits the inclusive Jacobian prefix. nt register sets
    per step hide the carry-chain latency of the limb arithmetic."""
    k, C, ncomp, _, nt = tiles.shape[:5]
    assert C == (2 if mixed else 3)
    nl = l15.NL if limb15 else NLIMB
    in_blk = (1, C, ncomp, NLIMB, nt) + TILE
    out_blk = (1, 3, ncomp, NLIMB, nt) + TILE
    return pl.pallas_call(
        _make_prefix_kernel(ncomp, mixed, complete, limb15),
        grid=(k,),
        in_specs=[pl.BlockSpec(in_blk, lambda j: (j, 0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_blk, lambda j: (j, 0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, 3) + tiles.shape[2:], jnp.uint32),
        scratch_shapes=[pltpu.VMEM((3, ncomp, nl, nt) + TILE, jnp.uint32)],
        interpret=interpret,
    )(tiles)


def _make_wsum_kernel(ncomp, complete, limb15=False):
    """Weighted suffix reduction: over L grid steps fed B[L-1-j], maintains
    acc = running sum and tot = sum of running sums, so after the last step
    acc = sum_l B_l and tot = sum_l (l+1) * B_l. Emits both. With
    ``limb15=True`` both accumulators live in the 17x15-bit R' domain
    (same load/store conversion discipline as the prefix kernels)."""
    F = l15.field15(ncomp) if limb15 else _field(ncomp)

    def kernel(in_ref, out_ref, acc_ref, tot_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            _zero_ref(acc_ref)
            _zero_ref(tot_ref)

        nl = l15.NL if limb15 else NLIMB
        Q = _load(in_ref.at[0], ncomp)
        if limb15:
            Q = tuple([l15.load15_from16(comp) for comp in coord]
                      for coord in Q)
        acc = _padd(F, _load(acc_ref, ncomp, nlimb=nl), Q, complete)
        tot = _padd(F, _load(tot_ref, ncomp, nlimb=nl), acc, complete)
        _store(acc_ref, acc, ncomp, nlimb=nl)
        _store(tot_ref, tot, ncomp, nlimb=nl)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            a, t = acc, tot
            if limb15:
                a = tuple([l15.store16_from15(comp) for comp in coord]
                          for coord in a)
                t = tuple([l15.store16_from15(comp) for comp in coord]
                          for coord in t)
            _store(out_ref.at[0], a, ncomp)
            _store(out_ref.at[1], t, ncomp)

    return kernel


def _wsum_tiles(tiles, complete, interpret=False, limb15=False):
    L, _, ncomp, _, nt = tiles.shape[:5]
    nl = l15.NL if limb15 else NLIMB
    blk = (1, 3, ncomp, NLIMB, nt) + TILE
    out_blk = (2, 3, ncomp, NLIMB, nt) + TILE
    return pl.pallas_call(
        _make_wsum_kernel(ncomp, complete, limb15),
        grid=(L,),
        in_specs=[pl.BlockSpec(blk, lambda j: (j, 0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_blk, lambda j: (0, 0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2,) + tiles.shape[1:], jnp.uint32),
        scratch_shapes=[pltpu.VMEM((3, ncomp, nl, nt) + TILE, jnp.uint32),
                        pltpu.VMEM((3, ncomp, nl, nt) + TILE, jnp.uint32)],
        interpret=interpret,
    )(tiles)


def _make_addn_kernel(ncomp, complete):
    F = _field(ncomp)

    def kernel(a_ref, b_ref, o_ref):
        R = _padd(F, _load(a_ref.at[0], ncomp), _load(b_ref.at[0], ncomp),
                  complete)
        _store(o_ref.at[0], R, ncomp)

    return kernel


def _add_tiles(a, b, complete, interpret=False):
    nb, _, ncomp, _, nt = a.shape[:5]
    blk = (1, 3, ncomp, NLIMB, nt) + TILE
    spec = pl.BlockSpec(blk, lambda j: (j, 0, 0, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_addn_kernel(ncomp, complete),
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        interpret=interpret,
    )(a, b)


def _make_scale_add_kernel(ncomp, log2s, complete):
    F = _field(ncomp)

    def kernel(a_ref, b_ref, o_ref):
        P = _load(a_ref, ncomp)
        if log2s:
            P = jax.lax.fori_loop(0, log2s, lambda i, s: _pdouble(F, s), P)
        R = _padd(F, P, _load(b_ref, ncomp), complete)
        _store(o_ref, R, ncomp)

    return kernel


def _scale_add_tile(a, b, log2s, complete, interpret=False):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_scale_add_kernel(a.shape[1], log2s, complete),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        interpret=interpret,
    )(a, b)


def _make_horner_kernel(ncomp, c, complete):
    F = _field(ncomp)

    def kernel(in_ref, out_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            _zero_ref(acc_ref)

        P = _load(acc_ref, ncomp)
        P = jax.lax.fori_loop(0, c, lambda i, s: _pdouble(F, s), P)
        P = _padd(F, P, _load(in_ref.at[0], ncomp), complete)
        _store(acc_ref, P, ncomp)

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            _store(out_ref, P, ncomp)

    return kernel


def _horner_tiles(tiles, c, complete, interpret=False):
    """tiles: (W, 3, ncomp, NLIMB, nt, 8, 128), step t = window W-1-t's
    sum broadcast across lanes. Returns the final MSM point as one tile."""
    W, _, ncomp, _, nt = tiles.shape[:5]
    blk = (1, 3, ncomp, NLIMB, nt) + TILE
    return pl.pallas_call(
        _make_horner_kernel(ncomp, c, complete),
        grid=(W,),
        in_specs=[pl.BlockSpec(blk, lambda t: (t, 0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, ncomp, NLIMB, nt) + TILE,
                               lambda t: (0, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tiles.shape[1:], jnp.uint32),
        scratch_shapes=[pltpu.VMEM((3, ncomp, NLIMB, nt) + TILE, jnp.uint32)],
        interpret=interpret,
    )(tiles)


# --------------------------------------------------------------------------
# Backends: rows-level API over the serial-scan primitives. "Rows" =
# uint32[n, 3, ncomp, NLIMB] Jacobian Montgomery points, Z = 0 encoding
# the identity.
# --------------------------------------------------------------------------


def _rows_to_lane_tiles(rows, lanes=TILE_N):
    """(n*lanes, C, ncomp, L) -> (n, C, ncomp, L, nt, 8, 128)."""
    n = rows.shape[0] // lanes
    C, ncomp, L = rows.shape[1:]
    nt = lanes // TILE_N
    return rows.reshape(n, nt, 8, 128, C, ncomp, L).transpose(
        0, 4, 5, 6, 1, 2, 3)


def _lane_tiles_to_rows(tiles):
    n, _, _, _, nt = tiles.shape[:5]
    return tiles.transpose(0, 4, 5, 6, 1, 2, 3).reshape(
        n * nt * TILE_N, *tiles.shape[1:4])


def _sorted_to_scan_tiles(rows, k, lanes=TILE_N):
    """Chunk-contiguous layout: row i -> (step i % k, lane i // k)."""
    C, ncomp, L = rows.shape[1:]
    nt = lanes // TILE_N
    return rows.reshape(lanes, k, C, ncomp, L).transpose(
        1, 2, 3, 4, 0).reshape(k, C, ncomp, L, nt, 8, 128)


def _scan_tiles_to_sorted(tiles):
    k, C, ncomp, L, nt = tiles.shape[:5]
    lanes = nt * TILE_N
    return tiles.reshape(k, C, ncomp, L, lanes).transpose(
        4, 0, 1, 2, 3).reshape(lanes * k, C, ncomp, L)


def _pad_rows(rows, lanes):
    pad = lanes - rows.shape[0]
    if pad:
        rows = jnp.pad(rows, ((0, pad),) + ((0, 0),) * (rows.ndim - 1))
    return rows


def _tile_to_lane_rows(tile, n):
    nt = tile.shape[3]
    return tile.transpose(3, 4, 5, 0, 1, 2).reshape(
        nt * TILE_N, *tile.shape[:3])[:n]


def rows_neg_y(rows):
    """Negate the Y coordinate of point rows (componentwise p - y)."""
    return rows.at[:, 1].set(jnp.asarray(FP.neg(rows[:, 1])))


class PallasBackend:
    """Real-TPU backend: serial phases as Pallas grid kernels.

    ``lanes`` = chunk count per prefix scan = nt * 1024 register-tile
    lanes per grid step (wider = fewer serial steps, better latency
    hiding; VMEM caps nt around 4-8). ``complete=False`` (prover mode,
    see _finish) applies ONLY to the mixed prefix scan over input points:
    the bucket-reduction/Horner stages hit STRUCTURAL doubling cases
    (empty buckets make the running sum meet its own accumulator, e.g.
    tot == acc in wsum) and always use complete adds."""

    def __init__(self, interpret=False, lanes=TILE_N, complete=True,
                 limb15=False):
        assert lanes % TILE_N == 0
        self.interpret = interpret
        self.lanes = lanes
        self.complete = complete
        self.limb15 = limb15

    def prefix(self, rows, k, mixed):
        """rows (lanes*k, C, nc, L) chunk-contiguous (C = 2 affine for the
        mixed path, 3 Jacobian otherwise) -> inclusive Jacobian prefixes.
        Only the mixed (input-point) scan may use incomplete adds."""
        tiles = _sorted_to_scan_tiles(rows, k, self.lanes)
        complete = self.complete if mixed else True
        return _scan_tiles_to_sorted(
            _prefix_tiles(tiles, mixed, complete, self.interpret,
                          self.limb15))

    def prefix_signed(self, rows_t, signs_t, k):
        """Mixed prefix over STEP-MAJOR gathered affine rows: rows_t
        (k*lanes, 2*nc*L) FLAT with row j*lanes + l = sorted position
        l*k+j, signs_t (k*lanes,) nonzero where Y negates. Returns the
        inclusive prefix in SORTED row order (same contract as
        prefix(mixed=True)); the retile transpose happens in-kernel."""
        lanes = self.lanes
        nt = lanes // TILE_N
        rt = rows_t.reshape(k, lanes, rows_t.shape[-1])
        sg = signs_t.astype(jnp.uint32).reshape(k, nt, *TILE)
        out = _prefix_rows_in(rt, sg, self.complete, self.interpret,
                              self.limb15)
        return _scan_tiles_to_sorted(out)

    def addn(self, a, b):
        n = a.shape[0]
        lanes = -(-n // self.lanes) * self.lanes
        out = _add_tiles(
            _rows_to_lane_tiles(_pad_rows(a, lanes), self.lanes),
            _rows_to_lane_tiles(_pad_rows(b, lanes), self.lanes),
            True, self.interpret)
        return _lane_tiles_to_rows(out)[:n]

    def wsum(self, B):
        """B (lanes, L, 3, nc, NL) -> (acc, tot) rows (lanes, 3, nc, NL):
        acc = sum_l B[:, l], tot = sum_l (l+1) * B[:, l]. Lane counts
        beyond ``self.lanes`` widen the per-step tile (nt > default) so
        wide windows (c = 14/16 -> W*C up to 4096) reduce in one scan."""
        nl, L = B.shape[:2]
        _, ncomp = B.shape[2:4]
        lanes = max(self.lanes, -(-nl // TILE_N) * TILE_N)
        nt = lanes // TILE_N
        steps = jnp.moveaxis(B, 1, 0)[::-1]      # (L, nl, 3, nc, NL)
        steps = jnp.pad(steps,
                        ((0, 0), (0, lanes - nl)) + ((0, 0),) * 3)
        tiles = steps.reshape(L, nt, 8, 128, 3, ncomp, NLIMB).transpose(
            0, 4, 5, 6, 1, 2, 3)
        out = _wsum_tiles(tiles, True, self.interpret, self.limb15)
        return (_tile_to_lane_rows(out[0], nl),
                _tile_to_lane_rows(out[1], nl))

    def scale_add(self, a, b, log2s):
        """2^log2s * a + b on rows (count <= lanes)."""
        n = a.shape[0]
        ta = _rows_to_lane_tiles(_pad_rows(a, self.lanes), self.lanes)[0]
        tb = _rows_to_lane_tiles(_pad_rows(b, self.lanes), self.lanes)[0]
        out = _scale_add_tile(ta, tb, log2s, True, self.interpret)
        return _tile_to_lane_rows(out, n)

    def horner(self, S, c):
        """S (W, 3, nc, NL) window sums -> final MSM point row (3, nc, NL)."""
        nt = self.lanes // TILE_N
        h_in = jnp.broadcast_to(
            S[::-1][:, :, :, :, None, None, None], S.shape + (nt,) + TILE)
        out = _horner_tiles(h_in, c, True, self.interpret)
        return _tile_to_lane_rows(out, 1)[0]


class XlaBackend:
    """Portable backend: same pipeline as lax.scan over batched array ops
    (scan-based fctx limb arithmetic — small graphs, CPU-compilable). Used
    by the CPU test suite and the virtual-mesh multichip dryrun."""

    def __init__(self, ncomp, complete=True):
        self.F = _xfield(ncomp)
        self.ncomp = ncomp
        self.lanes = TILE_N
        self.complete = complete

    def _pt(self, rows):
        return (rows[..., 0, :, :], rows[..., 1, :, :], rows[..., 2, :, :])

    @staticmethod
    def _rows(P):
        return jnp.stack(P, axis=-3)

    def prefix_signed(self, rows_t, signs_t, k):
        """Portable equivalent of PallasBackend.prefix_signed: un-transpose
        the step-major FLAT stream back to sorted order, apply the Y sign,
        and reuse the scan-based mixed prefix."""
        lanes = self.lanes
        nc = self.ncomp
        rows = rows_t.reshape(k, lanes, 2, nc, NLIMB).transpose(
            1, 0, 2, 3, 4).reshape(k * lanes, 2, nc, NLIMB)
        sg = signs_t.reshape(k, lanes).T.reshape(-1)
        yneg = jnp.asarray(FP.neg(rows[:, 1]))
        rows = rows.at[:, 1].set(
            jnp.where((sg != 0)[:, None, None], yneg, rows[:, 1]))
        return self.prefix(rows, k, mixed=True)

    def prefix(self, rows, k, mixed):
        resh = jnp.moveaxis(
            rows.reshape(self.lanes, k, *rows.shape[1:]), 1, 0)

        complete = self.complete if mixed else True

        def step(acc, q):
            if mixed:
                Q = (q[..., 0, :, :], q[..., 1, :, :])
            else:
                Q = self._pt(q)
            R = (_pmadd if mixed else _padd)(
                self.F, self._pt(acc), Q, complete)
            nacc = self._rows(R)
            return nacc, nacc

        init = jnp.zeros(resh.shape[1:2] + (3,) + resh.shape[3:],
                         jnp.uint32)
        _, pref = jax.lax.scan(step, init, resh)
        return jnp.moveaxis(pref, 0, 1).reshape(
            (rows.shape[0], 3) + rows.shape[2:])

    def addn(self, a, b):
        return self._rows(_padd(self.F, self._pt(a), self._pt(b)))

    def wsum(self, B):
        steps = jnp.moveaxis(B, 1, 0)[::-1]

        def step(carry, q):
            acc, tot = carry
            acc = self._rows(_padd(self.F, self._pt(acc), self._pt(q)))
            tot = self._rows(_padd(self.F, self._pt(tot), self._pt(acc)))
            return (acc, tot), None

        z = jnp.zeros_like(steps[0])
        (acc, tot), _ = jax.lax.scan(step, (z, z), steps)
        return acc, tot

    def _dbl_n(self, rows, n):
        """2^n * rows via a scan (one doubling body in the graph)."""
        def step(r, _):
            return self._rows(_pdouble(self.F, self._pt(r))), None

        out, _ = jax.lax.scan(step, rows, None, length=n)
        return out

    def scale_add(self, a, b, log2s):
        return self.addn(self._dbl_n(a, log2s), b)

    def horner(self, S, c):
        def step(acc, s):
            acc = self._dbl_n(acc[None], c)[0]
            return self.addn(acc[None], s[None])[0], None

        acc, _ = jax.lax.scan(step, jnp.zeros_like(S[0]), S[::-1])
        return acc


# --------------------------------------------------------------------------
# Signed window digits.
# --------------------------------------------------------------------------


def _take0(a, idx):
    """Row gather with in-bounds promise (no OOB select_n/fill lanes;
    jnp.take's mode= does not accept promise_in_bounds)."""
    return a.at[idx].get(mode="promise_in_bounds")


def n_windows(c: int, nbits: int = SCALAR_BITS) -> int:
    return -(-nbits // c)


def signed_digits(limbs, c: int, nbits: int = SCALAR_BITS):
    """uint32[N, 16] plain (non-Montgomery) scalar limbs -> (bucket, neg):
    bucket int32[N, W] in [0, 2^(c-1)], neg bool[N, W]; scalar =
    sum_w sign_w * bucket_w * 2^(c*w).

    ``nbits`` narrows the recode for scalars known to be < 2^(nbits-1)
    (one guard bit, like SCALAR_BITS for full Fr): the window scan then
    runs ceil(nbits/c) iterations instead of 20 — used by the multichip
    dryrun (tiny scalars, 6.7x less window work on the virtual CPU mesh)
    and available to any caller with bounded scalars."""
    W = n_windows(c, nbits)
    cmask = np.uint32((1 << c) - 1)
    half = 1 << (c - 1)
    raw = []
    for w in range(W):
        o = w * c
        lo, sh = o // WBITS, o % WBITS
        v = limbs[:, lo] >> np.uint32(sh)
        if lo + 1 < NLIMB and sh + c > WBITS:
            v = v | (limbs[:, lo + 1] << np.uint32(WBITS - sh))
        raw.append(v & cmask)
    digits = []
    carry = jnp.zeros_like(raw[0])
    for w in range(W):
        d = raw[w] + carry
        carry = (d > half).astype(jnp.uint32)
        digits.append(d.astype(jnp.int32) - (carry.astype(jnp.int32) << c))
    dig = jnp.stack(digits, axis=1)
    return jnp.abs(dig), dig < 0


# --------------------------------------------------------------------------
# Full MSM.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _safe_point(ncomp: int):
    """A valid curve point substituted for identity inputs (their digits
    are zeroed, so it never contributes): the G1 / G2 generator, as
    (2, ncomp, NLIMB) Montgomery limbs."""
    from tpu_zkpool.fields import bn254
    if ncomp == 1:
        xy = [[bn254.G1_GX], [bn254.G1_GY]]
    else:
        from tpu_zkpool.refimpl import pairing_ref as pr
        (x0, x1), (y0, y1) = pr.G2_GEN
        xy = [[x0, x1], [y0, y1]]
    return np.asarray(FP.to_mont(np.asarray(xy, dtype=object)),
                      dtype=np.uint32)


def _reduction_shape(half: int):
    """Bucket axis factorization half = C * L for the two-level weighted
    suffix reduction: L = per-wsum steps (power of two, <= 128), C = chunk
    count (any size — wsum widens to multi-tile lanes when W*C > 1024)."""
    L = min(128, half)
    C = half // L
    assert C * L == half
    return C, L


def make_backend(backend: str, ncomp: int, interpret: bool = False,
                 lanes: int = TILE_N, complete: bool = True,
                 limb15: bool = False):
    return PallasBackend(interpret, lanes, complete, limb15) \
        if backend == "pallas" else XlaBackend(ncomp, complete)


# Max points per sub-MSM slice. Measured on v5e (scripts/gather_prof.py):
# XLA row-gather throughput cliffs on SOURCE ROW COUNT — ~1 ns/row at
# 2^17 rows, 7.8 ns/row at 2^18, 34.6 ns/row at 2^20 — so a 2^20 MSM
# gathers 30x faster as eight 2^17-point slices whose window sums fold
# with W Jacobian adds each (window sums are additive over point subsets;
# same seam as parallel/msm_sharded.py).
SUB_LOG2 = 17


def window_sums(rows, scalar_limbs, c, be, sub_log2=SUB_LOG2,
                nbits=SCALAR_BITS, tree=False):
    """Per-window Pippenger sums S_w (W, 3, ncomp, 16) of the local point
    set — everything except the final Horner combine. This is the sharding
    seam: point-axis-sharded MSM computes local window sums per device,
    folds them with one collective, and Horner runs once
    (tpu_zkpool/parallel/msm_sharded.py).

    Point sets larger than 2^``sub_log2`` are processed as a scan over
    slices (see SUB_LOG2) with the per-slice window sums folded by
    Jacobian adds."""
    N = rows.shape[0]
    SUB = 1 << sub_log2
    if N > SUB and N % SUB == 0:
        W = n_windows(c, nbits)
        rsub = rows.reshape(N // SUB, SUB, *rows.shape[1:])
        lsub = scalar_limbs.reshape(N // SUB, SUB, scalar_limbs.shape[-1])

        def body(acc, xs):
            r, l = xs
            Sw = _window_sums_one(r, l, c, be, nbits, tree)
            return be.addn(acc, Sw), None

        init = jnp.zeros((W, 3) + rows.shape[2:], jnp.uint32)
        acc, _ = jax.lax.scan(body, init, (rsub, lsub))
        return acc
    return _window_sums_one(rows, scalar_limbs, c, be, nbits, tree)


def _window_sums_one(rows, scalar_limbs, c, be, nbits=SCALAR_BITS,
                     tree=False):
    """One slice of ``window_sums`` (the round-1 full pipeline, with the
    per-window point stream fed to the kernel-side retile path
    ``prefix_signed`` in step-major order)."""
    N, _, ncomp, _ = rows.shape
    lanes = be.lanes
    assert N % lanes == 0
    k = N // lanes
    W = n_windows(c, nbits)
    half = 1 << (c - 1)
    C, L = _reduction_shape(half)

    bucket, neg = signed_digits(scalar_limbs, c, nbits)
    # identity inputs (Z = 0) contribute nothing: zero their digits so they
    # land in the never-read bucket 0, and substitute a valid curve point
    # for their (meaningless) coordinates so the prefix scan stays inside
    # the group. The mixed-add kernel then needs no Z plane at all — the
    # per-window gather moves 2 coordinates instead of 3.
    valid = jnp.any(rows[:, 2].reshape(rows.shape[0], -1) != 0, axis=-1)
    bucket = jnp.where(valid[:, None], bucket, 0)
    neg = neg & valid[:, None]
    safe = jnp.asarray(_safe_point(ncomp))         # (2, ncomp, NLIMB)
    xy = jnp.where(valid[:, None, None, None], rows[:, :2], safe)
    # Co-sort a packed (index | neg << 31) payload with the bucket keys:
    # the sorted keys ARE the searchsorted input and the payload carries
    # both the gather order and the Y-sign — no per-window element
    # gathers of bucket/neg columns remain (they were ~half the gather
    # time at 2^17).
    payload = (jnp.arange(N, dtype=jnp.uint32)[:, None]
               | (neg.astype(jnp.uint32) << 31))   # (N, W)
    skeys, svals = jax.lax.sort((bucket, payload), dimension=0, num_keys=1)

    if tree and ncomp == 1:
        # Batched-affine pairwise tree over the sorted bucket segments
        # (msm/affine_tree.py) — replaces the chunk-prefix + boundary
        # machinery below with ~5M+1S affine adds per point.
        from tpu_zkpool.msm import affine_tree as at
        xyf = xy.reshape(N, 2 * NLIMB)
        sv_t = svals.T                            # (W, N)
        pts_list = []
        for w in range(W):
            order = sv_t[w] & jnp.uint32(0x7FFFFFFF)
            pw = _take0(xyf, order)
            sg = (sv_t[w] >> 31) != 0
            ys = pw[:, NLIMB:]
            ys = jnp.where(sg[:, None], jnp.asarray(FP.neg(ys)), ys)
            pts_list.append(jnp.concatenate([pw[:, :NLIMB], ys], axis=1))
        if isinstance(be, PallasBackend):
            level_fn = functools.partial(at.tree_level_pallas,
                                         complete=be.complete,
                                         interpret=be.interpret,
                                         limb15=be.limb15)
        else:
            level_fn = functools.partial(at.tree_level_xla,
                                         complete=be.complete)
        B = at.bucket_sums_tree(pts_list, skeys.T.astype(jnp.int32), half,
                                level_fn, be.complete)
        return _reduce_buckets(B, W, half, C, L, be, ncomp)
    # ONE transpose to step-major payload for all windows (the per-window
    # (lanes, k) transpose inside the scan cost 135 us/window at 2^17;
    # this 3-D copy replaces 160 of them with 8 at 2^20).
    svals_t = svals.reshape(lanes, k, W).transpose(2, 1, 0)  # (W, k, lanes)

    nq = half + 2                                  # boundary queries 0..half+1
    HI = (half >> 6) + 1                           # hi-radix histogram bins

    def per_window(_, xs):
        ds, pv_t = xs                              # sorted buckets, payload
        # STEP-MAJOR gather order: row j*lanes + l = sorted position
        # l*k + j, so the prefix kernel's per-step block is one contiguous
        # 128*lanes-byte DMA and the limb retile happens in VMEM
        # (prefix_signed). The source is RANK-2 (N, words): XLA:TPU's fast
        # row-gather emitter does not fire for rank-4 operands (measured
        # 1 ns/row rank-2 vs ~30 ns/row rank-4, scripts/gather_prof.py),
        # and the permutation indices are in-bounds by construction.
        pv_t = pv_t.reshape(-1)
        order_t = pv_t & jnp.uint32(0x7FFFFFFF)
        sg_t = pv_t >> 31
        rs_t = _take0(xy.reshape(N, -1), order_t)   # (N, words)
        # starts[v] = #keys < v via an MXU radix histogram (v = hi*64+lo,
        # one-hot int8 dot -> exact int32 counts) + exclusive cumsum; the
        # vmapped-binary-search searchsorted this replaces was 21% of
        # device self-time at 2^20 (80 ms of 4098-row boundary gathers).
        hi8 = jax.nn.one_hot(ds >> 6, HI, dtype=jnp.int8)
        lo8 = jax.nn.one_hot(ds & 63, 64, dtype=jnp.int8)
        counts = jax.lax.dot_general(hi8, lo8, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
        cum = jnp.cumsum(counts.reshape(-1))
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), cum])[:nq]   # (nq,)
        pr = be.prefix_signed(rs_t, sg_t, k)       # within-chunk inclusive
        idx = jnp.clip(starts - 1, 0, N - 1)
        # rank-2 view for the boundary gathers (fast row-gather emitter)
        prf = pr.reshape(N, -1)
        point = pr.shape[1:]
        wvals = _take0(prf, idx).reshape((nq,) + point)
        cids = idx // k
        zmask = starts == 0
        totals = _take0(prf, (jnp.arange(lanes) + 1) * k - 1).reshape(
            (lanes,) + point)
        return None, (wvals, cids, zmask, totals)

    _, (WV, CID, ZM, TOT) = jax.lax.scan(
        per_window, None,
        (skeys.T, svals_t))
    # WV (W, nq, 3, ncomp, L); TOT (W, lanes, 3, ncomp, L)

    # ---- cross-chunk exclusive prefix of the `lanes` chunk totals, all
    # windows batched into lanes: level 1 groups the chunks of window w
    # into GA groups of 32; flat row index (w*GA+g)*32 + e = w*lanes +
    # g*32 + e is exactly TOT's flat order.
    GA = lanes // 32
    l1_rows = _pad_rows(TOT.reshape(W * lanes, 3, ncomp, NLIMB),
                        lanes * 32)
    l1 = be.prefix(l1_rows, 32, mixed=False)
    pt = (3, ncomp, NLIMB)
    l1f = l1.reshape(l1.shape[0], -1)              # rank-2 gather sources
    gtot = l1f[jnp.arange(W * GA) * 32 + 31].reshape((W * GA,) + pt)
    l2_rows = _pad_rows(gtot, lanes * GA)
    l2 = be.prefix(l2_rows, GA, mixed=False)       # lane w, element g
    l2f = l2.reshape(l2.shape[0], -1)

    # excl[w, chunk=g*32+e] = l1[e-1 @ lane w*GA+g] + l2[g-1 @ lane w]
    wi = jnp.arange(W)[:, None]
    ch = jnp.arange(lanes)[None, :]
    g, e = ch // 32, ch % 32
    a_idx = ((wi * GA + g) * 32 + (e - 1)).reshape(-1)
    e_mask = jnp.broadcast_to(e == 0, (W, lanes)).reshape(-1)
    a = _take0(l1f, jnp.clip(a_idx, 0, None))
    a = jnp.where(e_mask[:, None], jnp.zeros_like(a), a)
    b_idx = (wi * GA + (g - 1)).reshape(-1)
    g_mask = jnp.broadcast_to(g == 0, (W, lanes)).reshape(-1)
    b = _take0(l2f, jnp.clip(b_idx, 0, None))
    b = jnp.where(g_mask[:, None], jnp.zeros_like(b), b)
    excl = be.addn(a.reshape((W * lanes,) + pt), b.reshape((W * lanes,) + pt))

    # ---- E[i] at bucket boundaries; B_j = E[start_{j+1}] - E[start_j] ----
    exf = excl.reshape(W * lanes, -1)
    ex_at = _take0(exf, (wi * lanes + CID).reshape(-1))
    E = be.addn(ex_at.reshape((W * nq,) + pt),
                WV.reshape(W * nq, 3, ncomp, NLIMB))
    E = E.reshape(W, nq, 3, ncomp, NLIMB)
    E = jnp.where(ZM[:, :, None, None, None], jnp.zeros_like(E), E)

    lo = rows_neg_y(E[:, 1:-1].reshape(W * half, 3, ncomp, NLIMB))
    hi = E[:, 2:].reshape(W * half, 3, ncomp, NLIMB)
    B = be.addn(hi, lo).reshape(W, half, 3, ncomp, NLIMB)
    # B[w, j-1] = bucket j's sum, j = 1..half
    return _reduce_buckets(B, W, half, C, L, be, ncomp)


def _reduce_buckets(B, W, half, C, L, be, ncomp):
    """Bucket reduction sum_j j*B_j per window, j = m*L + (l+1), from the
    dense bucket rows B (W, half, 3, ncomp, NLIMB)."""
    Bm = B.reshape(W * C, L, 3, ncomp, NLIMB)
    T, U = be.wsum(Bm)                             # (W*C,) lanes
    T = T.reshape(W, C, 3, ncomp, NLIMB)
    U = U.reshape(W, C, 3, ncomp, NLIMB)

    if C > 1:
        # lanes = W, steps = C: wsum wants (lanes, L, ...) = (W, C, ...)
        accT, uT = be.wsum(T)
        accU, _ = be.wsum(U)
        # sum_m m*T_m = (sum (m+1) T_m) - (sum T_m)
        mT = be.addn(uT, rows_neg_y(accT))
        sU = accU
    else:
        mT = jnp.zeros((W, 3, ncomp, NLIMB), jnp.uint32)
        sU = U[:, 0]

    # window sums S_w = L * (sum_m m*T_m) + sum_m U_m
    return be.scale_add(mT, sU, L.bit_length() - 1)   # (W, 3, ncomp, L)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _msm_rows(rows, scalar_limbs, c, backend, interpret, lanes, complete,
              limb15=False, nbits=SCALAR_BITS, tree=False):
    """rows: uint32[N, 3, ncomp, 16] Jacobian Montgomery points with Z in
    {R, 0}; scalar_limbs: uint32[N, 16] plain. N must be a multiple of
    ``lanes``. Returns the MSM as one point row (3, ncomp, 16)."""
    be = make_backend(backend, rows.shape[2], interpret, lanes, complete,
                      limb15)
    S = window_sums(rows, scalar_limbs, c, be, nbits=nbits, tree=tree)
    return be.horner(S, c)                         # (3, ncomp, L)


def _msm_rows_dispatch(rows, scalar_limbs, c, backend, interpret, lanes,
                       complete, limb15, nbits, tree=False):
    """Route through the disk-cached exported module for the Pallas
    backend: tracing+lowering the big limb graphs costs minutes per
    process (utils/aot.py round-4 measurements) and the module depends
    only on shapes + static config + source version. The XLA backend
    (CPU tests, virtual meshes) keeps the plain jit — its modules are
    small and the export would pin the wrong platform."""
    statics = (c, backend, interpret, lanes, complete, limb15, nbits, tree)
    if backend == "pallas" and not interpret:
        from tpu_zkpool.utils import aot
        if aot.enabled():
            fn = aot.cached_call(
                f"msm_rows_n{rows.shape[0]}x{rows.shape[2]}", _msm_rows,
                (jax.ShapeDtypeStruct(rows.shape, jnp.uint32),
                 jax.ShapeDtypeStruct(scalar_limbs.shape, jnp.uint32))
                + statics,
                static_args=statics)
            return fn(rows, scalar_limbs)
    return _msm_rows(rows, scalar_limbs, *statics)


def msm_grid_g1(points, scalar_limbs, c: int = 13, backend: str = "pallas",
                interpret: bool = False, lanes: int = TILE_N,
                complete: bool = True, limb15: bool = False,
                nbits: int = SCALAR_BITS, tree: bool = False):
    """Grid-accumulator MSM over G1.

    points: (X, Y, Z) uint32[N, 16] Montgomery Jacobian with Z in {R, 0}
    (affine inputs or identity padding); scalar_limbs uint32[N, 16] plain.
    N must be a multiple of ``lanes``. Returns (X, Y, Z) uint32[16] each.
    ``lanes``/``complete``: see PallasBackend; ``limb15`` switches the
    prefix scans to the 15-bit-limb kernels (curve/limb15.py); ``tree``
    switches bucket accumulation to the batched-affine pairwise tree
    (msm/affine_tree.py — ~5M+1S per add vs 8M+3S).
    """
    X, Y, Z = points
    rows = jnp.stack([X, Y, Z], axis=1)[:, :, None, :]
    out = _msm_rows_dispatch(rows, jnp.asarray(scalar_limbs), c, backend,
                             interpret, lanes, complete, limb15, nbits,
                             tree)
    return out[0, 0], out[1, 0], out[2, 0]


def msm_grid_g2(points, scalar_limbs, c: int = 13, backend: str = "pallas",
                interpret: bool = False, lanes: int = TILE_N,
                complete: bool = True, limb15: bool = False,
                nbits: int = SCALAR_BITS, tree: bool = False):
    """Grid-accumulator MSM over G2 (coordinates in Fp2).

    points: (X, Y, Z) uint32[N, 2, 16] Montgomery Jacobian (Z in {R, 0}).
    Returns (X, Y, Z) uint32[2, 16] each. ``tree`` is accepted for API
    parity but the affine tree currently implements ncomp == 1 only
    (window_sums falls back to the prefix path for G2).
    """
    X, Y, Z = points
    rows = jnp.stack([X, Y, Z], axis=1)
    out = _msm_rows_dispatch(rows, jnp.asarray(scalar_limbs), c, backend,
                             interpret, lanes, complete, limb15, nbits,
                             tree)
    return out[0], out[1], out[2]


def pad_to_tiles(arrs, n):
    """Pad leading axis of each array to the next multiple of 1024 >= n."""
    N = max(TILE_N, -(-n // TILE_N) * TILE_N)
    return [jnp.pad(jnp.asarray(a), ((0, N - n),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs]
