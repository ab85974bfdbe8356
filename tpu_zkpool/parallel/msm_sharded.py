"""Point-axis-sharded grid MSM over the device mesh.

The TP/EP analogue (SURVEY.md §2.4): each device runs the full grid
Pippenger pipeline (sort, chunked prefix, bucket reduction) on its local
point shard down to per-window sums, the W window sums are folded across
devices with one ``all_gather`` (W points per device cross ICI — the only
communication), and the Horner combine runs once on the replicated sums.
This is the weak-scaling path for the 2^22 MSM target: local work is
O(N/D), communication is O(W * D) points.

Every public entry point runs as ONE jitted program per (mesh, params)
combination: calling ``shard_map`` outside ``jit`` executes the body in
eager mode — thousands of per-primitive GSPMD compiles, each too small
for the persistent compile cache — which turned a ~4 minute compile into
40+ minutes on a 4-core host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.sharding import PartitionSpec as P

from tpu_zkpool.msm.grid import (
    SCALAR_BITS, TILE_N, make_backend, window_sums,
)


@functools.lru_cache(maxsize=None)
def _sharded_msm_fn(mesh, axis: str, c: int, backend: str, interpret: bool,
                    ncomp: int, nbits: int):
    def run(rows, scalar_limbs):
        def local(rows_l, limbs_l):
            be = make_backend(backend, ncomp, interpret)
            S = window_sums(rows_l, limbs_l, c, be,
                            nbits=nbits)              # (W, 3, ncomp, 16)
            allS = jax.lax.all_gather(S, axis)        # (D, W, 3, ncomp, 16)

            def fold(acc, s):
                return be.addn(acc, s), None

            S_tot, _ = jax.lax.scan(fold, jnp.zeros_like(S), allS)
            return S_tot

        S = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis)), out_specs=P(),
            check_vma=False,
        )(rows, scalar_limbs)
        be = make_backend(backend, ncomp, interpret)
        return be.horner(S, c)

    return jax.jit(run)


def msm_grid_sharded(rows, scalar_limbs, mesh, axis: str = "dp",
                     c: int = 13, backend: str = "xla",
                     interpret: bool = False, nbits: int = SCALAR_BITS):
    """MSM with the point axis sharded over ``mesh[axis]``.

    rows: uint32[N, 3, ncomp, 16] Jacobian Montgomery (Z in {R, 0});
    scalar_limbs: uint32[N, 16] plain. N must be a multiple of
    1024 * mesh.shape[axis]. Returns one point row (3, ncomp, 16).
    ``nbits``: scalar bound for the signed recode (grid.signed_digits).
    """
    D = mesh.shape[axis]
    N = rows.shape[0]
    ncomp = rows.shape[2]
    assert N % (TILE_N * D) == 0, "need 1024 points per device"
    return _sharded_msm_fn(mesh, axis, c, backend, interpret, ncomp, nbits)(
        rows, scalar_limbs)


@functools.lru_cache(maxsize=None)
def _sharded_msm_2d_fn(mesh, axis_host: str, axis_chip: str, c: int,
                       backend: str, interpret: bool, ncomp: int):
    from tpu_zkpool.parallel.multihost import hierarchical_fold

    def run(rows, scalar_limbs):
        def local(rows_l, limbs_l):
            be = make_backend(backend, ncomp, interpret)
            S = window_sums(rows_l, limbs_l, c, be)

            def fold(acc, part):
                return be.addn(acc, part)

            return hierarchical_fold(fold, S, mesh, axis_host, axis_chip)

        S = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P((axis_host, axis_chip)), P((axis_host, axis_chip))),
            out_specs=P(),
            check_vma=False,
        )(rows, scalar_limbs)
        be = make_backend(backend, ncomp, interpret)
        return be.horner(S, c)

    return jax.jit(run)


def msm_grid_sharded_2d(rows, scalar_limbs, mesh, axis_host: str = "host",
                        axis_chip: str = "chip", c: int = 13,
                        backend: str = "xla", interpret: bool = False):
    """Pod-scale MSM over a (host, chip) mesh: per-device window sums fold
    hierarchically — ICI (chip axis) first, then one partial per host over
    DCN (parallel/multihost.py) — before the single Horner combine."""
    D = mesh.shape[axis_host] * mesh.shape[axis_chip]
    N = rows.shape[0]
    ncomp = rows.shape[2]
    assert N % (TILE_N * D) == 0, "need 1024 points per device"
    return _sharded_msm_2d_fn(mesh, axis_host, axis_chip, c, backend,
                              interpret, ncomp)(rows, scalar_limbs)
