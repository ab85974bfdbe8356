"""Multi-host (DCN) startup + hierarchical reduction layout (SURVEY.md §5).

The reference has no distributed backend at all (its only transport is
Solana RPC); the TPU framework's equivalent of "NCCL" is JAX collectives
over ICI within a slice and DCN across hosts. This module owns:

- ``initialize()``: ``jax.distributed`` startup from either explicit
  arguments or the standard cluster env (TPU pods auto-detect),
- ``pod_mesh()``: a (host, chip) mesh whose inner axis is ICI-contiguous
  so that the heavy collectives (MSM window-sum folds, NTT butterflies)
  ride ICI while only one partial per host crosses DCN,
- ``hierarchical_fold()``: the two-level combine used by the sharded MSM
  at pod scale — fold window sums over the intra-host axis first, then
  all_gather the per-host partials over the host axis.

Single-host processes degrade gracefully (initialize() is a no-op when no
cluster env is present), so the same code runs on the 8-device virtual
mesh in tests and on a real slice unchanged.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """jax.distributed.initialize with graceful single-host fallback.
    Returns True when a multi-process runtime was started."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
            return True
        if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
                "MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()   # cluster env auto-detection
            return True
    except Exception:
        pass
    return False


def pod_mesh(axis_host: str = "host", axis_chip: str = "chip"):
    """(num_hosts, chips_per_host) mesh; inner axis ICI-local per host."""
    devs = jax.devices()
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, per)
    return jax.sharding.Mesh(grid, (axis_host, axis_chip))


def hierarchical_fold(fold_fn, x, mesh, axis_host: str = "host",
                      axis_chip: str = "chip"):
    """Two-level reduction of per-device partials living inside a
    shard_map region: ``fold_fn(acc, part) -> acc`` combines partials.

    Level 1 gathers over the intra-host (ICI) axis and folds; level 2
    gathers the per-host results over the DCN axis and folds — so the DCN
    transfer is one partial per host instead of one per chip.
    """
    local = jax.lax.all_gather(x, axis_chip)         # (chips, ...)

    def scan_fold(acc, part):
        return fold_fn(acc, part), None

    acc1, _ = jax.lax.scan(scan_fold, jnp.zeros_like(x), local)
    hosts = jax.lax.all_gather(acc1, axis_host)      # (hosts, ...)
    acc2, _ = jax.lax.scan(scan_fold, jnp.zeros_like(x), hosts)
    return acc2
