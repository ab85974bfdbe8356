"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The heavier sharded-MSM check is gated behind RUN_SLOW=1 (several minutes
of XLA CPU compile); the dp-sharded hash/NTT pipeline runs always (it is
also the driver's dryrun path).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def _mesh(n=8):
    devs = np.array(jax.devices()[:n])
    if devs.size < n:
        pytest.skip(f"need {n} devices")
    return Mesh(devs, ("dp",))


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="multi-minute compile; the driver runs dryrun_multichip directly")
def test_dryrun_multichip_runs():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="sharded MSM compile is minutes on CPU (RUN_SLOW=1)")
def test_msm_sharded_matches_single():
    import random
    from tpu_zkpool.curve.weierstrass import G1
    from tpu_zkpool.msm import msm, msm_sharded
    from tpu_zkpool.msm.pippenger import window_digits
    from tpu_zkpool.refimpl import pairing_ref as pr
    from tpu_zkpool.fields.bn254 import G1_GX, G1_GY

    mesh = _mesh(8)
    rng = random.Random(21)
    N = 64
    ks = [rng.randrange(1 << 16) for _ in range(N)]
    base = [rng.randrange(1, 1 << 30) for _ in range(N)]
    pts_aff = [pr.g1_mul(b, (G1_GX, G1_GY)) for b in base]
    pts = G1.from_affine_ints([p[0] for p in pts_aff], [p[1] for p in pts_aff])
    digs = jnp.asarray(window_digits(ks, nbits=16, c=4))
    shard = NamedSharding(mesh, P("dp"))
    pts_s = tuple(jax.device_put(a, shard) for a in pts)
    digs_s = jax.device_put(digs, shard)
    res = msm_sharded(G1, pts_s, digs_s, mesh, c=4)
    xs, ys = G1.to_affine_ints(tuple(np.asarray(r)[None] for r in res))
    exp = None
    for k, p in zip(ks, pts_aff):
        exp = pr.g1_add(exp, pr.g1_mul(k, p))
    assert (int(np.asarray(xs).reshape(-1)[0]),
            int(np.asarray(ys).reshape(-1)[0])) == exp
