"""Precomputed Miller-loop line coefficients for fixed/known G2 points.

A Groth16 verification pairs each proof leg against a G2 point that is
either fixed per verifying key (gamma, delta, beta, the Pedersen
commitment key) or known on the host at verify time (the proof's B).
The naive device Miller loop (``pairing_jax.miller_loop``) recomputes the
G2 point chain on chip with one Fermat-inverse per line (~300 field muls
each, ~80% of the loop's cost).  Instead we walk the 6x+2 schedule ONCE on
the host in exact bigint arithmetic and record, per line, the two Fp2
coefficients that do not depend on the G1 argument:

    l(P) = py + (-lam * px) * w + (lam * t_x - t_y) * w^3

i.e. ``alpha_neg = -lam`` and ``beta = lam * t_x - t_y``.  The device then
evaluates each line with two Fp multiplications and one sparse Fp12
product -- no Fp2 inversions, no G2 arithmetic, no point selects.

This is the same trade gnark's verifier makes (precomputed ``LineEvaluation``
arrays for the fixed VK points); the reference's on-chain verifier
(`withdraw.rs:163-175`) inherits it from gnark-crypto.  Schedule layout
mirrors ``pairing_jax.miller_loop`` exactly: one double line per ATE bit,
one add line per set bit (zero-filled otherwise, masked on device by the
same ``bit == 1`` select), then the two Frobenius end lines.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from tpu_zkpool.fields.bn254 import FP_MOD as P, BN_X
from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.refimpl import pairing_ref as pr

ATE_BITS = [int(b) for b in bin(6 * BN_X + 2)[3:]]  # MSB dropped
N_STEPS = len(ATE_BITS)


class LineArrays(NamedTuple):
    """Device-resident line coefficients for one pairing leg.

    Every array is Montgomery limbs ``uint32[S, *batch, 16]`` where S is
    the step axis scanned by ``pairing_jax.miller_loop_lines``:
    ``dbl_*`` / ``add_*`` have S = len(ATE_BITS), ``end_*`` has S = 2.
    ``*_an0/an1`` are the Fp2 components of ``-lam``; ``*_b0/b1`` of
    ``lam*t_x - t_y``.
    """
    dbl_an0: jnp.ndarray
    dbl_an1: jnp.ndarray
    dbl_b0: jnp.ndarray
    dbl_b1: jnp.ndarray
    add_an0: jnp.ndarray
    add_an1: jnp.ndarray
    add_b0: jnp.ndarray
    add_b1: jnp.ndarray
    end_an0: jnp.ndarray
    end_an1: jnp.ndarray
    end_b0: jnp.ndarray
    end_b1: jnp.ndarray


# jax.export must serialize LineArrays pytrees when the lines pairing
# path goes through the utils/aot.py module cache (pairing_lines_equal).
try:
    from jax import export as _jexp
    _jexp.register_namedtuple_serialization(
        LineArrays, serialized_name="tpu_zkpool.LineArrays")
except (ImportError, AttributeError):   # older jax: AOT path degrades
    pass


def _coeffs_dbl(t):
    """(alpha_neg, beta) of the tangent line at t; new t = 2t."""
    tx, ty = t
    lam = pr.f2_mul(pr.f2_scalar(pr.f2_sqr(tx), 3),
                    pr.f2_inv(pr.f2_scalar(ty, 2)))
    x3 = pr.f2_sub(pr.f2_sub(pr.f2_sqr(lam), tx), tx)
    y3 = pr.f2_sub(pr.f2_mul(lam, pr.f2_sub(tx, x3)), ty)
    beta = pr.f2_sub(pr.f2_mul(lam, tx), ty)
    return (x3, y3), pr.f2_neg(lam), beta


def _coeffs_add(t, q):
    """(alpha_neg, beta) of the chord through t and q; new t = t + q."""
    tx, ty = t
    qx, qy = q
    lam = pr.f2_mul(pr.f2_sub(qy, ty), pr.f2_inv(pr.f2_sub(qx, tx)))
    x3 = pr.f2_sub(pr.f2_sub(pr.f2_sqr(lam), tx), qx)
    y3 = pr.f2_sub(pr.f2_mul(lam, pr.f2_sub(tx, x3)), ty)
    beta = pr.f2_sub(pr.f2_mul(lam, tx), ty)
    return (x3, y3), pr.f2_neg(lam), beta


_F2Z = (0, 0)


def g2_line_schedule(q):
    """Walk the 6x+2 Miller schedule for G2 point ``q`` on the host.

    Returns (dbl, add, end): lists of (alpha_neg, beta) Fp2 int pairs with
    len(dbl) = len(add) = N_STEPS and len(end) = 2; ``add[i]`` is zeros
    where ATE bit i is 0 (the device masks those multiplies out).
    """
    t = q
    dbl, add = [], []
    for b in ATE_BITS:
        t, an, beta = _coeffs_dbl(t)
        dbl.append((an, beta))
        if b:
            t, an, beta = _coeffs_add(t, q)
            add.append((an, beta))
        else:
            add.append((_F2Z, _F2Z))
    q1 = pr.g2_frobenius(q)
    q2 = pr.g2_neg(pr.g2_frobenius(q1))
    end = []
    t, an, beta = _coeffs_add(t, q1)
    end.append((an, beta))
    t, an, beta = _coeffs_add(t, q2)
    end.append((an, beta))
    return dbl, add, end


def _mont(col):
    return jnp.asarray(FP.to_mont(np.asarray(col, dtype=object)))


def _pack(schedules):
    """[(dbl, add, end)] per batch element -> LineArrays.

    One schedule gives unbatched arrays (S, 16); n > 1 stack to (S, n, 16)
    so the step axis stays leading for the device scan.
    """
    cols = []
    for part in range(3):                      # dbl, add, end
        for coeff in range(2):                 # alpha_neg, beta
            for comp in range(2):              # Fp2 c0, c1
                col = [[entry[coeff][comp] for entry in sched[part]]
                       for sched in schedules]
                arr = _mont([v for row in col for v in row])
                S = len(col[0])
                if len(schedules) == 1:
                    cols.append(arr.reshape(S, 16))
                else:
                    cols.append(arr.reshape(len(schedules), S, 16)
                                .transpose(1, 0, 2))
    # cols order: dbl(an0,an1,b0,b1), add(...), end(...)
    return LineArrays(*cols)


def precompute_g2_lines(q) -> LineArrays:
    """Line coefficients for one fixed G2 point (per-VK, cache the result)."""
    return _pack([g2_line_schedule(q)])


def _batch_f2_inv(ds):
    """Invert a list of Fp2 values with ONE Fp inversion total: per-value
    norm n = a^2 + b^2 (u^2 = -1), Montgomery-trick batch inversion of the
    norms, then inv = conj / norm. The per-proof line precompute walks
    ~110 schedule steps; without this each step pays len(qs) modular
    exponentiations (the dominant host cost at batch 256)."""
    norms = [(a * a + b * b) % P for a, b in ds]
    pref = [1]
    for n in norms:
        pref.append(pref[-1] * n % P)
    inv_all = pow(pref[-1], P - 2, P)
    out = [None] * len(ds)
    for i in range(len(ds) - 1, -1, -1):
        ninv = inv_all * pref[i] % P
        inv_all = inv_all * norms[i] % P
        a, b = ds[i]
        out[i] = (a * ninv % P, (-b * ninv) % P)
    return out


def g2_line_schedules_batch(qs):
    """``g2_line_schedule`` for many G2 points at once, with the per-step
    Fp2 inversions batched across the points (one Fp exponentiation per
    schedule step instead of one per point per step)."""
    n = len(qs)
    ts = list(qs)
    dbl = [[] for _ in range(n)]
    add = [[] for _ in range(n)]

    def steps(is_dbl, out_lists):
        if is_dbl:
            dens = [pr.f2_scalar(ty, 2) for (_, ty) in ts]
            nums = [pr.f2_scalar(pr.f2_sqr(tx), 3) for (tx, _) in ts]
            qs_step = ts
        else:
            dens = [pr.f2_sub(qx, tx) for (tx, _), (qx, _) in zip(ts, qs)]
            nums = [pr.f2_sub(qy, ty) for (_, ty), (_, qy) in zip(ts, qs)]
            qs_step = qs
        invs = _batch_f2_inv(dens)
        for i in range(n):
            tx, ty = ts[i]
            qx, _ = qs_step[i]
            lam = pr.f2_mul(nums[i], invs[i])
            x3 = pr.f2_sub(pr.f2_sub(pr.f2_sqr(lam), tx), qx)
            y3 = pr.f2_sub(pr.f2_mul(lam, pr.f2_sub(tx, x3)), ty)
            beta = pr.f2_sub(pr.f2_mul(lam, tx), ty)
            ts[i] = (x3, y3)
            out_lists[i].append((pr.f2_neg(lam), beta))

    for b in ATE_BITS:
        steps(True, dbl)
        if b:
            steps(False, add)
        else:
            for lst in add:
                lst.append((_F2Z, _F2Z))
    end = [[] for _ in range(n)]
    q1s = [pr.g2_frobenius(q) for q in qs]
    q2s = [pr.g2_neg(pr.g2_frobenius(q1)) for q1 in q1s]
    for qstep in (q1s, q2s):
        dens = [pr.f2_sub(qx, tx) for (tx, _), (qx, _) in zip(ts, qstep)]
        invs = _batch_f2_inv(dens)
        for i in range(n):
            tx, ty = ts[i]
            qx, qy = qstep[i]
            lam = pr.f2_mul(pr.f2_sub(qy, ty), invs[i])
            x3 = pr.f2_sub(pr.f2_sub(pr.f2_sqr(lam), tx), qx)
            y3 = pr.f2_sub(pr.f2_mul(lam, pr.f2_sub(tx, x3)), ty)
            beta = pr.f2_sub(pr.f2_mul(lam, tx), ty)
            ts[i] = (x3, y3)
            end[i].append((pr.f2_neg(lam), beta))
    return [(dbl[i], add[i], end[i]) for i in range(n)]


def precompute_g2_lines_batch(qs) -> LineArrays:
    """Batched per-proof lines: qs = [Fp2 affine pairs] -> (S, n, 16) arrays."""
    return _pack(g2_line_schedules_batch(qs))
