"""Sharded-kernel tests on the 8-device virtual CPU mesh (default suite).

Covers the coefficient-axis-sharded NTT (ICI butterfly exchange via
ppermute) bit-exactly against the single-chip NTT and the schoolbook
oracle, and the point-sharded MSM window-sum fold (gated: heavy compile).
"""

import os
import random

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.rlwe import ntt
from tpu_zkpool.parallel import (
    forward_sharded, inverse_sharded, negacyclic_mul_sharded,
)
from tpu_zkpool.refimpl import rlwe_ref
from tpu_zkpool.fields.rlweq import Q


def _mesh(n, name):
    devs = jax.devices()[:n]
    return jax.sharding.Mesh(np.asarray(devs), (name,))


def test_sharded_ntt_roundtrip_matches_single_chip():
    rng = random.Random(3)
    n, B = 1024, 4
    x = np.array([[rng.randrange(Q) for _ in range(n)] for _ in range(B)],
                 dtype=np.uint32)
    mesh = _mesh(8, "sp")
    xd = jnp.asarray(x)
    f_sh = np.asarray(forward_sharded(xd, mesh))
    f_ref = np.asarray(ntt.forward(xd))
    assert (f_sh == f_ref).all(), "sharded forward != single-chip forward"
    back = np.asarray(inverse_sharded(jnp.asarray(f_sh), mesh))
    assert (back == x).all(), "sharded inverse roundtrip"


def test_sharded_negacyclic_mul_vs_oracle():
    rng = random.Random(11)
    n = 1024
    a = [rng.randrange(Q) for _ in range(n)]
    b = [rng.randrange(Q) for _ in range(n)]
    mesh = _mesh(8, "sp")
    got = np.asarray(negacyclic_mul_sharded(
        jnp.asarray(np.array([a], dtype=np.uint32)),
        jnp.asarray(np.array([b], dtype=np.uint32)), mesh))[0]
    exp = rlwe_ref.negacyclic_mul(a, b)
    assert [int(v) for v in got] == [int(v) for v in exp]


def test_sharded_ntt_two_devices():
    """D = 2 exercises the hd = 1 edge of the exchange schedule."""
    rng = random.Random(5)
    n = 256
    x = np.array([rng.randrange(Q) for _ in range(n)], dtype=np.uint32)
    mesh = _mesh(2, "sp")
    f_sh = np.asarray(forward_sharded(jnp.asarray(x), mesh))
    f_ref = np.asarray(ntt.forward(jnp.asarray(x)))
    assert (f_sh == f_ref).all()


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="several-minute XLA-CPU compile (RUN_SLOW=1)")
def test_sharded_msm_vs_native():
    from tpu_zkpool.parallel import msm_grid_sharded
    from tpu_zkpool.curve.weierstrass import G1
    from tpu_zkpool import native_bridge
    from tpu_zkpool.fields.bn254 import FR_MOD
    from tpu_zkpool.fields.limbs import ints_to_limbs

    rng = random.Random(9)
    D, n = 8, 8192
    base = [rng.randrange(1, 1 << 62) for _ in range(n)]
    aff = native_bridge.g1_gen_mul_batch(base)
    ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    rows = jnp.stack([X, Y, Z], axis=1)[:, :, None, :]
    limbs = jnp.asarray(ints_to_limbs(ks))
    mesh = _mesh(D, "dp")
    out = msm_grid_sharded(rows, limbs, mesh, axis="dp", c=13, backend="xla")
    xs, ys = G1.to_affine_ints(tuple(np.asarray(out[i, 0])[None][None]
                                     for i in range(3)))
    got = (int(np.asarray(xs).reshape(-1)[0]),
           int(np.asarray(ys).reshape(-1)[0]))
    assert got == native_bridge.g1_msm(ks, aff)


def test_hierarchical_fold_virtual_pod():
    """multihost.hierarchical_fold on a (2 hosts x 4 chips) virtual mesh:
    ICI-axis fold then one partial per host over the DCN axis."""
    from jax.sharding import PartitionSpec as P
    from tpu_zkpool.parallel.multihost import hierarchical_fold

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("host", "chip"))
    x = jnp.arange(8., dtype=jnp.float32)

    def local(xl):
        return hierarchical_fold(lambda a, b: a + b, xl, mesh)

    out = jax.shard_map(local, mesh=mesh,
                        in_specs=P(("host", "chip")), out_specs=P(),
                        check_vma=False)(x)
    assert float(np.asarray(out)[0]) == float(x.sum())


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="several-minute XLA-CPU compile (RUN_SLOW=1)")
def test_sharded_msm_2d_vs_native():
    from tpu_zkpool.parallel.msm_sharded import msm_grid_sharded_2d
    from tpu_zkpool.curve.weierstrass import G1
    from tpu_zkpool import native_bridge
    from tpu_zkpool.fields.bn254 import FR_MOD
    from tpu_zkpool.fields.limbs import ints_to_limbs

    rng = random.Random(19)
    n = 8192
    base = [rng.randrange(1, 1 << 62) for _ in range(n)]
    aff = native_bridge.g1_gen_mul_batch(base)
    ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    rows = jnp.stack([X, Y, Z], axis=1)[:, :, None, :]
    limbs = jnp.asarray(ints_to_limbs(ks))
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = jax.sharding.Mesh(devs, ("host", "chip"))
    out = msm_grid_sharded_2d(rows, limbs, mesh, backend="xla")
    xs, ys = G1.to_affine_ints(tuple(np.asarray(out[i, 0])[None][None]
                                     for i in range(3)))
    got = (int(np.asarray(xs).reshape(-1)[0]),
           int(np.asarray(ys).reshape(-1)[0]))
    assert got == native_bridge.g1_msm(ks, aff)


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="several-minute XLA-CPU compile (RUN_SLOW=1)")
def test_leg_parallel_msm_vs_native():
    """Stage-parallel proving seam: 4 G1 legs on a (leg=4, pt=2) mesh,
    each leg's MSM bit-exact vs the native oracle."""
    from tpu_zkpool.parallel.prove_stages import msm_legs_sharded
    from tpu_zkpool.curve.weierstrass import G1
    from tpu_zkpool import native_bridge
    from tpu_zkpool.fields.bn254 import FR_MOD
    from tpu_zkpool.fields.limbs import ints_to_limbs

    rng = random.Random(21)
    n = 2048
    rows_legs, limbs_legs, oracle = [], [], []
    for leg in range(4):
        base = [rng.randrange(1, 1 << 62) for _ in range(n)]
        aff = native_bridge.g1_gen_mul_batch(base)
        ks = [rng.randrange(0, FR_MOD) for _ in range(n)]
        X, Y, Z = G1.from_affine_ints([p[0] for p in aff],
                                      [p[1] for p in aff])
        rows_legs.append(jnp.stack([X, Y, Z], axis=1)[:, :, None, :])
        limbs_legs.append(jnp.asarray(ints_to_limbs(ks)))
        oracle.append(native_bridge.g1_msm(ks, aff))
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = jax.sharding.Mesh(devs, ("leg", "pt"))
    out = msm_legs_sharded(jnp.stack(rows_legs), jnp.stack(limbs_legs),
                           mesh, backend="xla")
    for leg in range(4):
        xs, ys = G1.to_affine_ints(tuple(
            np.asarray(out[leg, i, 0])[None][None] for i in range(3)))
        got = (int(np.asarray(xs).reshape(-1)[0]),
               int(np.asarray(ys).reshape(-1)[0]))
        assert got == oracle[leg], f"leg {leg} mismatch"


def test_sharded_ntt_rdma_exchange_matches_ppermute():
    """The double-buffered Pallas-RDMA butterfly exchange (ntt_rdma.py,
    VERDICT round-2 item 7) is bit-exact with the ppermute path on the
    8-device virtual mesh (interpret mode discharges the remote DMAs;
    scripts/ntt_rdma_check.py drives the compiled kernel on real TPU)."""
    rng = random.Random(29)
    n, B = 1024, 8
    x = np.array([[rng.randrange(Q) for _ in range(n)] for _ in range(B)],
                 dtype=np.uint32)
    mesh = _mesh(8, "sp")
    xd = jnp.asarray(x)
    f_rdma = np.asarray(forward_sharded(xd, mesh, exchange="rdma",
                                        interpret=True))
    f_ref = np.asarray(ntt.forward(xd))
    assert (f_rdma == f_ref).all(), "rdma forward != single-chip forward"
    back = np.asarray(inverse_sharded(jnp.asarray(f_rdma), mesh,
                                      exchange="rdma", interpret=True))
    assert (back == x).all(), "rdma inverse roundtrip"


def test_sharded_msm_nbits_vs_native():
    """DEFAULT-suite coverage of the point-sharded MSM (the dryrun's TP
    stage): 39-bit scalars recode to 3 windows (grid.signed_digits nbits),
    cutting the virtual-mesh window-scan runtime ~6.7x — the full-width
    path stays under RUN_SLOW (test_sharded_msm_vs_native)."""
    from tpu_zkpool.parallel import msm_grid_sharded
    from tpu_zkpool.curve.weierstrass import G1
    from tpu_zkpool import native_bridge
    from tpu_zkpool.fields.limbs import ints_to_limbs

    rng = random.Random(11)
    D, n, nb = 8, 8192, 39
    base = [rng.randrange(1, 1 << 62) for _ in range(n)]
    aff = native_bridge.g1_gen_mul_batch(base)
    ks = [rng.randrange(0, 1 << (nb - 1)) for _ in range(n)]
    X, Y, Z = G1.from_affine_ints([p[0] for p in aff], [p[1] for p in aff])
    rows = jnp.stack([X, Y, Z], axis=1)[:, :, None, :]
    limbs = jnp.asarray(ints_to_limbs(ks))
    mesh = _mesh(D, "dp")
    out = msm_grid_sharded(rows, limbs, mesh, axis="dp", c=13,
                           backend="xla", nbits=nb)
    xs, ys = G1.to_affine_ints(tuple(np.asarray(out[i, 0])[None][None]
                                     for i in range(3)))
    got = (int(np.asarray(xs).reshape(-1)[0]),
           int(np.asarray(ys).reshape(-1)[0]))
    assert got == native_bridge.g1_msm(ks, aff)
