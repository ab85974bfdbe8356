"""Groth16 proving with the MSMs and H(X) on TPU.

The device-side counterpart of ``refimpl.groth16_ref.prove``: witness-scalar
MSMs over the proving-key queries run through the grid-accumulator
Pippenger pipeline (``msm.grid``) — G1 legs (A, B1, K, H) AND the G2 leg
(B2, Fp2 coordinates) — and H(X) = (UV - W)/t runs through the Fr-domain
NTT (``groth16.domain``). This replaces the gnark prover behind
``sunspot prove`` (``noir_circuit/prove_linux.sh:80-84``).

The constraint matvecs (U/V/W evaluations) are sparse host work for now;
they become device CSR matmuls when proving throughput moves beyond
single proofs.
"""

from __future__ import annotations

import functools
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.bn254 import FR_MOD as R
from tpu_zkpool.fields.fctx import FR, FP
from tpu_zkpool.fields.limbs import (ints_to_limbs, int_to_limbs, NLIMB,
                                     pack_limbs16, unpack_limbs16_jnp)
from tpu_zkpool.msm.grid import TILE_N, msm_grid_g1, msm_grid_g2
from tpu_zkpool.groth16 import domain
from tpu_zkpool.refimpl import groth16_ref as g16
from tpu_zkpool.refimpl import pairing_ref as pr


# Limb arrays cross the host->device boundary PACKED (two 16-bit limbs
# per uint32 word, fields.limbs.pack_limbs16) and unpack on device: the
# axon tunnel moves ~37 MB/s, and at 1M+ constraints the prover's limb
# uploads (witness, H evaluations, proving-key queries) are the warm-path
# wall — packing halves every one of them. The unpack is a separate tiny
# jit, so the MSM/NTT graphs (which take limbs as ARGUMENTS) do not
# recompile.

@jax.jit
def _unpack_dev(packed):
    return unpack_limbs16_jnp(packed)


_R2_FR = (1 << 512) % R          # R^2 mod r with R = 2^256


@jax.jit
def _unpack_mont_fr(packed):
    """Packed plain Fr words -> Montgomery-domain 16-limb rows on device:
    mont_mul(x, R^2) = x*R. Replaces the host-side native to_mont_batch +
    a full-width upload."""
    limbs = unpack_limbs16_jnp(packed)
    r2 = jnp.broadcast_to(jnp.asarray(int_to_limbs(_R2_FR)), limbs.shape)
    return FR.mont_mul(limbs, r2)


def _pad_up(n: int) -> int:
    """Pad a point count to the kernel lane width — and, beyond one
    sub-MSM slice, to a multiple of the slice size: ``window_sums`` only
    engages its scan-over-slices fold when N divides evenly, and a
    single-slice gather at 2^20+ rows pays the XLA row-gather cliff the
    fold exists to avoid (docs/PLAN.md, MSM glue findings). Padding rows
    are identities (Z = 0), which the pipeline routes to the never-read
    bucket 0."""
    from tpu_zkpool.msm.grid import SUB_LOG2
    npad = max(TILE_N, -(-n // TILE_N) * TILE_N)
    sub = 1 << SUB_LOG2
    if npad > sub:
        npad = -(-npad // sub) * sub
    return npad


def _points_device(pts: list, npad_to: int = 0):
    """Affine G1 int points (None allowed) -> Jacobian limb arrays padded
    to a multiple of 1024 with identities (Z = 0). ``npad_to`` forces a
    larger common size (DeviceProvingKey leg unification)."""
    n = len(pts)
    npad = max(_pad_up(n), npad_to)
    xs = [p[0] if p else 0 for p in pts] + [0] * (npad - n)
    ys = [p[1] if p else 0 for p in pts] + [0] * (npad - n)
    X = _unpack_dev(jnp.asarray(pack_limbs16(
        FP.to_mont(np.asarray(xs, dtype=object)))))
    Y = _unpack_dev(jnp.asarray(pack_limbs16(
        FP.to_mont(np.asarray(ys, dtype=object)))))
    zmask = np.asarray([1 if p else 0 for p in pts] + [0] * (npad - n),
                       dtype=np.uint32)
    Z = FP.ones_mont((npad,)) * jnp.asarray(zmask)[:, None]
    return (X, Y, Z), npad


def _points_device_g2(pts: list, npad_to: int = 0):
    """Affine G2 points ((x0,x1),(y0,y1)) -> (N, 2, 16) coordinate limbs."""
    n = len(pts)
    npad = max(_pad_up(n), npad_to)
    def comp(sel):
        vals = [sel(p) if p else (0, 0) for p in pts] + [(0, 0)] * (npad - n)
        return _unpack_dev(jnp.asarray(pack_limbs16(
            FP.to_mont(np.asarray(vals, dtype=object)))))
    X = comp(lambda p: p[0])
    Y = comp(lambda p: p[1])
    zmask = np.asarray([1 if p else 0 for p in pts] + [0] * (npad - n),
                       dtype=np.uint32)
    one = FP.ones_mont((npad,)) * jnp.asarray(zmask)[:, None]
    Z = jnp.stack([one, jnp.zeros_like(one)], axis=1)   # Z = 1 + 0u (or 0)
    return (X, Y, Z), npad


def _scalar_limbs(scalars: list, npad: int) -> jnp.ndarray:
    arr = np.zeros((npad, NLIMB), dtype=np.uint32)
    if scalars:
        arr[: len(scalars)] = ints_to_limbs([s % R for s in scalars])
    return jnp.asarray(arr)


class DeviceProvingKey:
    """Device-resident query points (G1 and G2) + the host pk."""

    def __init__(self, pk: g16.ProvingKey, c: int = 13,
                 backend: str = "pallas", complete: bool = True,
                 limb15: bool = True, tree: bool = False,
                 pad_to: int = 0):
        # complete=False (prover mode, grid._finish) drops the doubling
        # branch: safe for large pseudorandom query sets (collision
        # probability ~2^-254 per add) but NOT for tiny/structured circuits
        # where duplicate query points are common — default to complete.
        # limb15 switches the prefix kernels to the 17x15-bit-limb field
        # ops (curve/limb15.py) — bit-exact, fewer VPU ops per add; only
        # meaningful for backend="pallas" (the XLA backend ignores it).
        self.pk = pk
        self.c = c
        self.backend = backend
        self.complete = complete
        self.limb15 = limb15 if backend == "pallas" else False
        # tree: batched-affine bucket accumulation (msm/affine_tree.py)
        # for the G1 legs; the G2 leg keeps the prefix path (ncomp == 2).
        self.tree = tree
        # Unify small G1 legs to ONE padded size so the prover compiles a
        # single _msm_rows graph instead of one per distinct leg length:
        # each new grid size costs minutes of Mosaic compile through the
        # tunnel (the round-3 warm-up never finished the prove-family
        # compiles inside 1500 s). Only when the largest leg fits one
        # sub-MSM slice — for million-constraint circuits the H leg is
        # several slices bigger than A/B1/K and unifying would add real
        # MSM work, so those keep per-leg sizes.
        # pad_to: force EVERY leg (G2 included) to one size — lets
        # different circuits of similar scale share all compiled MSM
        # graphs (e.g. the two const-PK audit variants both padded to
        # the bench-warm 2^17 G1 size; scripts/benchmark_variants.py
        # --device). Identity padding rows cost linear extra MSM work
        # but zero new Mosaic compiles.
        from tpu_zkpool.msm.grid import SUB_LOG2
        npads = [_pad_up(len(q)) for q in
                 (pk.a_query, pk.b1_query, pk.k_query, pk.h_query)]
        unified = max(npads) if max(npads) <= (1 << SUB_LOG2) else 0
        if pad_to:
            assert pad_to >= max(npads), (pad_to, npads)
            unified = pad_to
        self.a_query, self._na = _points_device(pk.a_query, unified)
        self.b1_query, _ = _points_device(pk.b1_query, unified)
        self.k_query, self._nk = _points_device(pk.k_query, unified)
        self.h_query, self._nh = _points_device(pk.h_query, unified)
        self.b2_query, self._nb2 = _points_device_g2(pk.b2_query, pad_to)

    # ---------------------------------------------------------------- MSMs
    #
    # Dispatch (device arrays out, async) and fetch (host affine ints) are
    # separate so ``prove`` can launch every MSM before blocking on any:
    # each device_get through the tunnel costs a full round trip, and the
    # five legs are independent until the final host combine.

    def _msm_g1_dispatch(self, points_dev, npad, scalars):
        limbs = (scalars if isinstance(scalars, jnp.ndarray)
                 else _scalar_limbs(scalars, npad))
        return msm_grid_g1(points_dev, limbs[:npad], c=self.c,
                           backend=self.backend, complete=self.complete,
                           limb15=self.limb15, tree=self.tree)

    def _msm_g2_dispatch(self, scalars):
        limbs = (scalars if isinstance(scalars, jnp.ndarray)
                 else _scalar_limbs(scalars, self._nb2))
        return msm_grid_g2(self.b2_query, limbs[: self._nb2],
                           c=self.c, backend=self.backend,
                           complete=self.complete, limb15=self.limb15)

    def _msm_g1(self, points_dev, npad, scalars):
        return _g1_affine(self._msm_g1_dispatch(points_dev, npad, scalars))

    def _msm_g2(self, scalars):
        return _g2_affine(self._msm_g2_dispatch(scalars))


def _g1_affine(out):
    """One device_get of the 3 limb rows, then host-int affine conversion.
    (An eager device inversion here costs seconds in tunnel round trips —
    the batched ``to_affine_ints`` path is for wide arrays, not 1 point.)"""
    X, Y, Z = jax.device_get(out)
    x = int(FP.from_mont(np.asarray(X)[None])[0])
    y = int(FP.from_mont(np.asarray(Y)[None])[0])
    z = int(FP.from_mont(np.asarray(Z)[None])[0])
    if z == 0:
        return None
    P = pr.P
    zi = pow(z, -1, P)
    zi2 = zi * zi % P
    return (x * zi2 % P, y * zi2 * zi % P)


def _g2_affine(out):
    """(X, Y, Z) Fp2 Jacobian limb rows (2, 16) each -> affine int pairs
    (host inversion in Fp2)."""
    X = [int(v) for v in FP.from_mont(np.asarray(out[0]))]
    Y = [int(v) for v in FP.from_mont(np.asarray(out[1]))]
    Z = [int(v) for v in FP.from_mont(np.asarray(out[2]))]
    if Z == [0, 0]:
        return None
    P = pr.P

    def f2_mul(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % P,
                (a[0] * b[1] + a[1] * b[0]) % P)

    def f2_inv(a):
        d = pow((a[0] * a[0] + a[1] * a[1]) % P, -1, P)
        return (a[0] * d % P, (-a[1]) * d % P)

    zi = f2_inv(tuple(Z))
    zi2 = f2_mul(zi, zi)
    x = f2_mul(tuple(X), zi2)
    y = f2_mul(tuple(Y), f2_mul(zi2, zi))
    return (x, y)


@functools.partial(jax.jit, static_argnums=(3,))
def _h_pipeline(evs, tinv, tables, demont):
    """Module-level jit (compiles ONCE per domain size — a closure-local
    jit would silently recompile on every prove call, ~80 s each through
    the tunnel). The NTT/coset ``tables`` ride in as device-resident
    ARGUMENTS (domain.tables_device) — baked-in constants put ~0.5 GB of
    literals in the 2^21-domain HLO and broke the remote-compile
    transport. Montgomery bookkeeping: evs hold x*R; NTT stages preserve
    that; mont_mul(U*R, V*R) = U*V*R, so every intermediate stays in the
    Montgomery domain exactly."""
    fwd_tws, inv_tws, ninv, coset, coset_inv, br = tables
    coeffs = domain.interpolate_natural(evs, br, inv_tws, ninv)
    on_coset = domain.coset_forward(coeffs, coset, fwd_tws)
    uv = FR.mont_mul(on_coset[0], on_coset[1])
    numer = FR.sub(uv, on_coset[2])
    h_ev = FR.mont_mul(numer, tinv)
    h_m = domain.coset_inverse(h_ev, coset_inv, inv_tws, ninv)
    if demont:
        # mont_mul(h*R, 1) = h: canonical plain limbs, MSM-ready.
        one = jnp.broadcast_to(jnp.asarray(int_to_limbs(1)), h_m.shape)
        h_m = FR.mont_mul(h_m, one)
    return h_m


# Above this domain size the monolithic _h_pipeline's live set (three
# polys through 21 unrolled butterfly stages) exceeds v5e HBM: measured
# 27.4 GB at n = 2^21 vs 15.75 GB capacity. The split path below stages
# one poly at a time (peak / 3) at the cost of a few extra dispatches.
_H_SPLIT_MIN_N = 1 << 20


@jax.jit
def _h_interp_coset(ev, tables):
    """interpolate_natural + coset_forward of ONE poly (n, 16)."""
    fwd_tws, inv_tws, ninv, coset, _coset_inv, br = tables
    coeffs = domain.interpolate_natural(ev, br, inv_tws, ninv)
    return domain.coset_forward(coeffs, coset, fwd_tws)


@jax.jit
def _h_combine(a_ev, b_ev, c_ev, tinv):
    """(A*B - C) * t^-1 on the coset — elementwise."""
    uv = FR.mont_mul(a_ev, b_ev)
    return FR.mont_mul(FR.sub(uv, c_ev), tinv)


@functools.partial(jax.jit, static_argnums=(2,))
def _h_final(h_ev, tables, demont):
    _fwd, inv_tws, ninv, _coset, coset_inv, _br = tables
    h_m = domain.coset_inverse(h_ev, coset_inv, inv_tws, ninv)
    if demont:
        one = jnp.broadcast_to(jnp.asarray(int_to_limbs(1)), h_m.shape)
        h_m = FR.mont_mul(h_m, one)
    return h_m


def _h_pipeline_split(evs, tinv, tables, demont):
    """The _h_pipeline staged one poly at a time for big domains; device
    buffers of each stage are freed before the next starts."""
    on_coset = [_h_interp_coset(evs[i], tables) for i in range(3)]
    h_ev = _h_combine(on_coset[0], on_coset[1], on_coset[2], tinv)
    del on_coset
    return _h_final(h_ev, tables, demont)


def compute_h_device(r1cs, w_full, n: int, as_limbs: bool = False,
                     w64: np.ndarray | None = None):
    """H(X) coefficients with the NTT work on device (evals host-side).

    ``as_limbs=True`` returns plain (non-Montgomery) scalar limbs as a
    device ``uint32[n, 16]`` array — the exact input the grid MSM wants —
    so the H leg never round-trips through host bigints. The U/V/W row
    evaluations run through the native CSR matvec (native/witness.cpp)
    when available (``w64`` = the uint64[n,4] witness image, built here
    if not passed); pure-Python bigints otherwise."""
    m = len(r1cs.a_rows)
    dev = None
    try:
        from tpu_zkpool.groth16 import solver_native as sn
        if w64 is None:
            w64 = sn.ints_to_u64x4(w_full)
        evs = np.zeros((3, n, 4), dtype=np.uint64)
        for i, rows in enumerate((r1cs.a_rows, r1cs.b_rows, r1cs.c_rows)):
            evs[i, :m] = sn.eval_rows_native((id(r1cs), i), rows, w64)
        # plain u64x4 IS the packed wire format (half the bytes of 16-limb
        # rows); Montgomery conversion happens on device (_unpack_mont_fr).
        dev = _unpack_mont_fr(jnp.asarray(evs.view("<u4").reshape(3, n, 8)))
    except (OSError, __import__("subprocess").CalledProcessError):
        pass
    if dev is None:
        ua = [r1cs.eval_row(r1cs.a_rows[c], w_full) for c in range(m)] + [0] * (n - m)
        vb = [r1cs.eval_row(r1cs.b_rows[c], w_full) for c in range(m)] + [0] * (n - m)
        wc = [r1cs.eval_row(r1cs.c_rows[c], w_full) for c in range(m)] + [0] * (n - m)
        dev = jnp.asarray(FR.to_mont(np.asarray([ua, vb, wc], dtype=object)))

    # t(g w^i) = g^n - 1, constant on the coset.
    t_coset_inv = pow(pow(domain.COSET_G, n, R) - 1, -1, R)
    tinv_m = jnp.asarray(FR.to_mont(np.asarray([t_coset_inv], dtype=object))[0])

    pipeline = (_h_pipeline_split if n >= _H_SPLIT_MIN_N else _h_pipeline)
    h_m = pipeline(dev, tinv_m, domain.tables_device(n), as_limbs)
    if as_limbs:
        return h_m
    return [int(v) for v in FR.from_mont(np.asarray(h_m))]


def _dispatch_legs(dpk: DeviceProvingKey, r1cs, w_full: list):
    """Launch all five MSMs (+ the H NTT feeding the H leg) WITHOUT
    blocking — execution is async; fetching after dispatch pays one
    tunnel round trip instead of five sequential ones. Returns the tuple
    of device arrays (a, b1, b2, ht, k)."""
    pk = dpk.pk
    n = pk.n_domain
    nmax = max(dpk._na, dpk._nb2)
    w64 = None
    try:
        from tpu_zkpool.groth16 import solver_native as sn
        w64 = sn.ints_to_u64x4(w_full)
        pad = np.zeros((nmax, NLIMB // 2), dtype=np.uint32)
        pad[: len(w_full)] = w64.view("<u4")
        w_limbs = _unpack_dev(jnp.asarray(pad))
    except (OSError, __import__("subprocess").CalledProcessError):
        w_limbs = _scalar_limbs(w_full, nmax)
    a_out = dpk._msm_g1_dispatch(dpk.a_query, dpk._na, w_limbs)
    b1_out = dpk._msm_g1_dispatch(dpk.b1_query, dpk._na, w_limbs)
    b2_out = dpk._msm_g2_dispatch(w_limbs)
    h_limbs = compute_h_device(r1cs, w_full, n, as_limbs=True, w64=w64)
    h_pad = jnp.pad(h_limbs[: n - 1],
                    ((0, dpk._nh - (n - 1)), (0, 0)))
    ht_out = dpk._msm_g1_dispatch(dpk.h_query, dpk._nh, h_pad)
    if pk.committed:
        cset = set(pk.committed)
        priv = [w_full[i] for i in range(r1cs.num_public, len(w_full))
                if i not in cset]
        if w64 is not None:
            from tpu_zkpool.groth16 import solver_native as sn
            kp = np.zeros((dpk._nk, NLIMB // 2), dtype=np.uint32)
            kp[: len(priv)] = sn.ints_to_u64x4(priv).view("<u4")
            k_limbs = _unpack_dev(jnp.asarray(kp))
        else:
            k_limbs = _scalar_limbs(priv, dpk._nk)
    elif w64 is not None:
        kp = np.zeros((dpk._nk, NLIMB // 2), dtype=np.uint32)
        kp[: len(w_full) - r1cs.num_public] = w64[r1cs.num_public:].view("<u4")
        k_limbs = _unpack_dev(jnp.asarray(kp))
    else:
        k_limbs = _scalar_limbs(w_full[r1cs.num_public:], dpk._nk)
    k_out = dpk._msm_g1_dispatch(dpk.k_query, dpk._nk, k_limbs)
    return (a_out, b1_out, b2_out, ht_out, k_out)


def prove(dpk: DeviceProvingKey, r1cs, w_full: list, seed: int = 7):
    """Groth16 proof with all four G1 MSMs, the G2 MSM, and H(X) on device.
    Emits (A, B2, C) or (A, B2, C, Commitment, Pok) matching
    refimpl.groth16_ref.prove exactly."""
    pk = dpk.pk
    rng = random.Random(seed)
    r_rand, s_rand = rng.randrange(R), rng.randrange(R)
    prof = os.environ.get("TPUZK_PROVE_PROFILE") == "1"
    marks = [("start", time.time())]

    def mark(label):
        if prof:
            marks.append((label, time.time()))

    legs = _dispatch_legs(dpk, r1cs, w_full)
    mark("dispatch (5 MSMs + H NTT)")

    # ---- fetch phase: one device_get for everything.
    a_out, b1_out, b2_out, ht_out, k_out = jax.device_get(legs)
    mark("fetch")

    proof = _finish_proof(dpk, (a_out, b1_out, b2_out, ht_out, k_out),
                          r_rand, s_rand, w_full)
    mark("combine + affine")
    if prof:
        for (_, t0), (label, t1) in zip(marks, marks[1:]):
            print(f"  [prove] {label}: {t1 - t0:.3f}s", flush=True)
    return proof


def _finish_proof(dpk: DeviceProvingKey, fetched, r_rand: int, s_rand: int,
                  w_full: list):
    """Host combine of fetched MSM leg outputs into the final proof."""
    pk = dpk.pk
    a_out, b1_out, b2_out, ht_out, k_out = fetched

    A = _g1_affine(a_out)
    A = pr.g1_add(pk.alpha1, A)
    A = pr.g1_add(A, pr.g1_mul(r_rand, pk.delta1) if r_rand else None)

    B1 = _g1_affine(b1_out)
    B1 = pr.g1_add(pk.beta1, B1)
    B1 = pr.g1_add(B1, pr.g1_mul(s_rand, pk.delta1) if s_rand else None)

    B2 = _g2_affine(b2_out)
    B2 = pr.g2_add(pk.beta2, B2)
    B2 = pr.g2_add(B2, pr.g2_mul(s_rand, pk.delta2) if s_rand else None)

    HT = _g1_affine(ht_out)
    Kpriv = _g1_affine(k_out)
    C = pr.g1_add(Kpriv, HT)
    C = pr.g1_add(C, pr.g1_mul(s_rand, A) if s_rand else None)
    C = pr.g1_add(C, pr.g1_mul(r_rand, B1) if r_rand else None)
    rs = r_rand * s_rand % R
    C = pr.g1_add(C, pr.g1_mul((R - rs) % R, pk.delta1) if rs else None)
    if pk.committed:
        from tpu_zkpool.refimpl import pedersen
        cm, pok = pedersen.commit(
            list(pk.basis), list(pk.basis_exp_sigma),
            [w_full[i] for i in pk.committed])
        return (A, B2, C, cm, pok)
    return (A, B2, C)


def prove_batch(dpk: DeviceProvingKey, r1cs, witnesses: list,
                seed: int = 7):
    """Batch Groth16 proving: dispatch the legs of EVERY proof before
    fetching any — the B x 5 MSM executions queue on the device back to
    back and the host pays a single round-trip wait, instead of B
    sequential prove() latencies (the payroll scenario,
    ``client/payroll-demo.ts:326-350``, where the reference runs 3
    prover subprocesses concurrently). Proof i uses blinding derived
    from ``seed + i``. Returns a list of proofs."""
    rng_pairs = []
    for i in range(len(witnesses)):
        rng = random.Random(seed + i)
        rng_pairs.append((rng.randrange(R), rng.randrange(R)))
    legs = [_dispatch_legs(dpk, r1cs, w) for w in witnesses]
    fetched = jax.device_get(legs)
    return [_finish_proof(dpk, f, r, s, w)
            for f, (r, s), w in zip(fetched, rng_pairs, witnesses)]
