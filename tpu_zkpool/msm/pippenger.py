"""Pippenger multi-scalar multiplication on TPU.

The core compute of Groth16 proving (the reference delegates this to gnark
inside `sunspot prove`, ``client/proof.helper.ts:64``; SURVEY.md §2.3).

TPU-first formulation of the data-dependent bucket accumulation
(SURVEY.md §7.3 hard part #3): instead of random scatter-adds,

1. split scalars into c-bit window digits (host precompute),
2. per window: SORT points by digit (argsort + gather),
3. bucket sums from a TWO-LEVEL prefix sum of Jacobian points over the
   sorted array — points reshaped to (chunks, chunk_len); a `lax.scan` over
   the chunk axis runs `chunk_len` serial steps each batched over all
   chunks (O(sqrt N) serial depth, full VPU width), then a second scan
   accumulates chunk totals. Bucket values come from segment-boundary
   differences (point negation is free),
4. bucket reduction sum_j j*B_j via a reversed running sum,
5. window combine with c doublings per window (Horner).

Multi-chip: points axis sharded over the mesh; each device reduces its
points to a per-window partial, combined with an all_gather + local fold
(only one point per window per device crosses ICI).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.curve.weierstrass import CurveOps

WINDOW_BITS = 8


def window_digits(scalars, nbits: int = 256, c: int = WINDOW_BITS) -> np.ndarray:
    """Host: int scalars -> uint32[N, n_windows] window digits (LSB window 0)."""
    scalars = np.asarray(scalars, dtype=object)
    n_windows = (nbits + c - 1) // c
    out = np.zeros((scalars.shape[0], n_windows), dtype=np.uint32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        s = int(s)
        for w in range(n_windows):
            out[i, w] = (s >> (c * w)) & mask
    return out


def _neg(curve: CurveOps, P):
    X, Y, Z = P
    return X, curve.F.neg(Y), Z


def _chunked_prefix(curve: CurveOps, Ps, chunk: int):
    """Global inclusive prefix sums of points along axis 0.

    Ps: tuple of (N, ...) arrays with N % chunk == 0. Returns tuple of
    (N + 1, ...) arrays with an identity prepended (exclusive-friendly).
    """
    n = Ps[0].shape[0]
    nchunks = n // chunk
    resh = tuple(a.reshape((nchunks, chunk) + a.shape[1:]) for a in Ps)
    # moveaxis chunk dim to scan over it: (chunk, nchunks, ...)
    resh = tuple(jnp.moveaxis(a, 1, 0) for a in resh)

    def within(acc, row):
        acc = curve.add(acc, row)
        return acc, acc

    ident_c = curve.identity((nchunks,))
    totals, within_pref = jax.lax.scan(within, ident_c, resh)
    # within_pref: (chunk, nchunks, ...) inclusive prefixes inside each chunk

    def across(acc, tot):
        new = curve.add(acc, tot)
        return new, acc  # exclusive prefix of chunk totals

    # scan over chunks: totals has shape (nchunks, ...)? totals is the last
    # carry (nchunks,) per-chunk totals — rebuild per-chunk totals from the
    # last within-prefix row instead:
    per_chunk_tot = tuple(a[-1] for a in within_pref)  # (nchunks, ...)
    per_chunk_tot = tuple(jnp.moveaxis(a, 0, 0) for a in per_chunk_tot)
    ident = curve.identity(())

    def across_scan(acc, tot):
        return curve.add(acc, tot), acc

    _, chunk_excl = jax.lax.scan(
        across_scan, ident, per_chunk_tot
    )  # (nchunks, ...) exclusive prefix of chunk totals

    # global inclusive prefix[i] = chunk_excl[i // chunk] + within_pref[i % chunk, i // chunk]
    glob = curve.add(
        tuple(jnp.moveaxis(a, 0, 1).reshape((n,) + a.shape[2:]) for a in within_pref),
        tuple(jnp.repeat(a, chunk, axis=0) for a in chunk_excl),
    )
    ident1 = curve.identity((1,))
    return tuple(jnp.concatenate([i, g], axis=0) for i, g in zip(ident1, glob))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm(curve: CurveOps, points, digits, c: int = WINDOW_BITS,
        chunk: int | None = None):
    """MSM of Jacobian points (X, Y, Z each uint32[N, 16]) by window digits
    uint32[N, n_windows]. Returns a single Jacobian point (uint32[16] x3).
    """
    X, Y, Z = points
    n = X.shape[0]
    n_windows = digits.shape[1]
    n_buckets = 1 << c
    if chunk is None:
        chunk = 1 << max(0, (n - 1).bit_length() // 2)
        while n % chunk:
            chunk >>= 1

    def window_sum(w):
        d = digits[:, w]
        order = jnp.argsort(d)
        ds = d[order]
        Ps = tuple(arr[order] for arr in (X, Y, Z))
        pref = _chunked_prefix(curve, Ps, chunk)

        buckets = jnp.arange(n_buckets, dtype=ds.dtype)
        starts = jnp.searchsorted(ds, buckets, side="left")
        ends = jnp.searchsorted(ds, buckets, side="right")
        B = curve.add(
            tuple(p[ends] for p in pref),
            _neg(curve, tuple(p[starts] for p in pref)),
        )

        # reversed running sum over buckets 1..n_buckets-1:
        # S_k = sum_{j >= k} B_j ; window total = sum_k S_k
        Brev = tuple(arr[1:][::-1] for arr in B)

        def runsum(carry, b):
            acc, tot = carry
            acc = curve.add(acc, b)
            tot = curve.add(tot, acc)
            return (acc, tot), None

        (acc, tot), _ = jax.lax.scan(
            runsum, (curve.identity(()), curve.identity(())), Brev
        )
        return tot

    def horner(acc, w):
        for _ in range(c):
            acc = curve.double(acc)
        return curve.add(acc, window_sum(n_windows - 1 - w)), None

    acc, _ = jax.lax.scan(horner, curve.identity(()), jnp.arange(n_windows))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_pallas(curve: CurveOps, points, digits, c: int = WINDOW_BITS,
               lanes: int = 2048):
    """Pippenger MSM with the Pallas point-add kernel on the hot loop.

    Identical structure to :func:`msm`, but the within-chunk prefix scan —
    the O(N) bulk of the work — runs `N / lanes` serial steps of a
    `lanes`-wide Pallas complete-add (1024-point register tiles), keeping
    the VPU saturated. Bucket extraction / reduction / Horner stay on the
    XLA path (O(windows * 2^c) small adds).

    G1 only (the kernel is specialized to Fp). N must be a multiple of
    ``lanes``; lanes a multiple of 1024.
    """
    from tpu_zkpool.curve import curve_pallas as cp

    # (measured: routing the small serial stages through the unrolled-field
    # curve REGRESSED TPU time 13.8s -> 18.5s at N=2^14 — the scan-based ops
    # fuse better through this compiler; keep the scan curve everywhere)
    sc = curve

    X, Y, Z = points
    n = X.shape[0]
    n_windows = digits.shape[1]
    n_buckets = 1 << c
    k_steps = n // lanes

    def window_sum(w):
        d = digits[:, w]
        order = jnp.argsort(d)
        ds = d[order]
        Ps = tuple(arr[order] for arr in (X, Y, Z))

        # within-chunk inclusive prefix via the Pallas add kernel.
        # Chunk c owns elements [c*k_steps, (c+1)*k_steps); reshaping
        # (n, 16) -> (lanes, k_steps, 16) puts chunk c at row c, and the
        # transpose scans over the within-chunk axis with `lanes`-wide adds.
        resh = tuple(a.reshape(lanes, k_steps, 16).transpose(1, 0, 2)
                     for a in Ps)

        def within(acc, row):
            acc = cp.add_pallas(acc, row)
            return acc, acc

        ident = (curve.F.zeros((lanes,)),) * 3
        _, pref_steps = jax.lax.scan(within, ident, resh)
        # pref_steps: (k_steps, lanes, 16) x3 inclusive within-chunk prefixes

        # exclusive prefix of chunk totals (lanes of them) — reuse the
        # two-level XLA prefix: inclusive-with-identity-prepended[i] is the
        # exclusive prefix at i.
        totals = tuple(a[-1] for a in pref_steps)  # (lanes, 16)
        tot_pref = _chunked_prefix(sc, totals, 64)
        chunk_excl = tuple(a[:-1] for a in tot_pref)
        # global prefix at index i (i = c*k_steps + j):
        glob = sc.add(
            tuple(jnp.moveaxis(a, 0, 1).reshape(n, 16) for a in pref_steps),
            tuple(jnp.repeat(a, k_steps, axis=0) for a in chunk_excl),
        )
        ident1 = curve.identity((1,))
        pref = tuple(jnp.concatenate([i_, g], axis=0)
                     for i_, g in zip(ident1, glob))

        buckets = jnp.arange(n_buckets, dtype=ds.dtype)
        starts = jnp.searchsorted(ds, buckets, side="left")
        ends = jnp.searchsorted(ds, buckets, side="right")
        B = sc.add(
            tuple(p[ends] for p in pref),
            _neg(sc, tuple(p[starts] for p in pref)),
        )
        return tuple(arr[1:] for arr in B)  # (n_buckets-1, 16) x3

    # Phase A: bucket values for every window (serial over windows; the O(N)
    # prefix inside runs on the Pallas kernel).
    def collect(_, w):
        return None, window_sum(w)

    _, Ball = jax.lax.scan(collect, None, jnp.arange(n_windows))
    # Ball: (n_windows, n_buckets-1, 16) x3

    # Phase B: bucket reduction batched ACROSS windows — one 255-step scan
    # of n_windows-wide adds instead of per-window serial scans.
    Brev = tuple(arr[:, ::-1] for arr in Ball)

    def runsum(carry, idx):
        acc, tot = carry
        b = tuple(arr[:, idx] for arr in Brev)
        acc = sc.add(acc, b)
        tot = sc.add(tot, acc)
        return (acc, tot), None

    ident_w = (curve.F.zeros((n_windows,)),) * 3
    (acc, tot), _ = jax.lax.scan(
        runsum, (ident_w, ident_w), jnp.arange(n_buckets - 1))
    # tot[w] = window w's sum

    # Phase C: Horner over windows, MSB first.
    def horner(acc, w):
        for _ in range(c):
            acc = sc.double(acc)
        return sc.add(acc, tuple(arr[n_windows - 1 - w] for arr in tot)), None

    acc, _ = jax.lax.scan(horner, sc.identity(()), jnp.arange(n_windows))
    return acc


def msm_sharded(curve: CurveOps, points, digits, mesh, axis="dp",
                c: int = WINDOW_BITS):
    """Points-sharded MSM over a mesh: per-device partial MSMs combined via
    all_gather (one point per device crosses ICI)."""
    from jax.sharding import PartitionSpec as P

    def local(points_l, digits_l):
        part = msm(curve, points_l, digits_l, c)
        gathered = jax.lax.all_gather(part, axis)  # (ndev, 16) x3

        def fold(acc, i):
            return curve.add(acc, tuple(arr[i] for arr in gathered)), None

        acc, _ = jax.lax.scan(
            fold, curve.identity(()), jnp.arange(gathered[0].shape[0])
        )
        return acc

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(points, digits)
