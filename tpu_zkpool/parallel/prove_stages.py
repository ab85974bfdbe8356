"""Leg-parallel Groth16 proving — the stage/pipeline-parallel analogue.

A Groth16 proof is four independent G1 MSMs (A, B1, H, K legs) plus the
G2 leg and a tiny host combine (SURVEY.md §2.4 "PP: stage pipeline ...
across chip groups"). Data-parallel batching (``prove_tpu.prove_batch``)
scales throughput; THIS module scales single-proof latency: a 2D
``(leg, pt)`` mesh gives each stage group one leg's query points, with
point-axis TP inside the group:

- every (leg, pt) device runs the full grid pipeline down to its local
  per-window sums (``msm.grid.window_sums`` — same SPMD program on every
  device, legs padded to one query size),
- window sums fold across the ``pt`` axis (one all_gather per group,
  the msm_sharded.py seam),
- each group Horner-combines its leg; one all_gather over ``leg``
  returns the four MSM results together.

The host combine (blinding, C assembly) is microseconds. Replaces the
serial five-MSM loop of gnark's one-process prover
(``/root/reference/client/proof.helper.ts:64``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.sharding import PartitionSpec as P

from tpu_zkpool.msm.grid import (SCALAR_BITS, TILE_N, make_backend,
                                 window_sums)

N_G1_LEGS = 4   # A, B1, H, K


@functools.lru_cache(maxsize=None)
def _leg_msm_fn(mesh, axis_leg: str, axis_pt: str, c: int, backend: str,
                interpret: bool, nbits: int):
    def run(rows_legs, limbs_legs):
        def local(rows_l, limbs_l):
            # rows_l: (1, N/Dpt, 3, 1, 16) — this group's leg, this
            # device's point shard
            be = make_backend(backend, 1, interpret)
            S = window_sums(rows_l[0], limbs_l[0], c, be, nbits=nbits)
            allS = jax.lax.all_gather(S, axis_pt)      # fold TP shards

            def fold(acc, s):
                return be.addn(acc, s), None

            S_tot, _ = jax.lax.scan(fold, jnp.zeros_like(S), allS)
            out = be.horner(S_tot, c)                  # (3, 1, 16)
            return out[None]

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis_leg, axis_pt), P(axis_leg, axis_pt)),
            out_specs=P(axis_leg),
            check_vma=False,
        )(rows_legs, limbs_legs)

    return jax.jit(run)


def msm_legs_sharded(rows_legs, limbs_legs, mesh, axis_leg: str = "leg",
                     axis_pt: str = "pt", c: int = 13,
                     backend: str = "xla", interpret: bool = False,
                     nbits: int = SCALAR_BITS):
    """Four G1 MSMs, one per stage group, points sharded inside groups.

    rows_legs: uint32[4, N, 3, 1, 16] Jacobian Montgomery (legs padded to
    a common N with identities, Z = 0); limbs_legs: uint32[4, N, 16]
    plain scalars. N must be a multiple of 1024 * mesh.shape[axis_pt].
    Returns uint32[4, 3, 1, 16] — the A, B1, H, K leg results.
    """
    assert rows_legs.shape[0] == N_G1_LEGS
    assert mesh.shape[axis_leg] == N_G1_LEGS
    Dpt = mesh.shape[axis_pt]
    assert rows_legs.shape[1] % (TILE_N * Dpt) == 0
    return _leg_msm_fn(mesh, axis_leg, axis_pt, c, backend, interpret,
                       nbits)(rows_legs, limbs_legs)
