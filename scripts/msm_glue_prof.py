"""Stage-isolation profiling of the grid-MSM XLA glue on the real TPU.

The per-window glue (sort, gather, tile transpose, boundary reads) around
the Pallas prefix kernel dominates MSM wall time at 2^17-2^20; full-graph
iteration costs a ~7-10 min XLA compile per try. This times each stage in
isolation (small graphs, fast compiles) so layout decisions are made from
measurements. Follows the axon rules: device_get of a reduced scalar to
force execution, inputs varied per iteration.

Usage: python scripts/msm_glue_prof.py [log2N] [stage...]
  stages: sort gather prefix untile boundary all
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_zkpool.utils import enable_compile_cache
enable_compile_cache()

from tpu_zkpool.fields.limbs import NLIMB
from tpu_zkpool.msm import grid as mg

TILE_N = mg.TILE_N
C = 13
W = mg.n_windows(C)
HALF = 1 << (C - 1)
NQ = HALF + 2


def timed(fn, args, label, iters=3, reseed=None):
    """Compile+warm once, then min over iters (varying via reseed(i))."""
    t0 = time.time()
    out = fn(*args)
    s = int(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    compile_s = time.time() - t0
    times = []
    for i in range(iters):
        a = reseed(i) if reseed else args
        t0 = time.time()
        out = fn(*a)
        s += int(jax.device_get(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
        times.append(time.time() - t0)
    print(f"  {label:34s} {min(times)*1000:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return min(times)


def rand_rows(key, n, payload):
    return jax.random.randint(key, (n,) + payload, 0, 1 << 16,
                              dtype=jnp.int32).astype(jnp.uint32)


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    stages = set(sys.argv[2:]) or {"all"}
    N = 1 << log2n
    k = N // TILE_N
    key = jax.random.PRNGKey(0)
    print(f"N=2^{log2n}, k={k}, W={W} windows of {HALF} buckets; "
          f"times are per ONE window unless noted", flush=True)

    kb, kp, kn = jax.random.split(key, 3)
    bucket = jax.random.randint(kb, (N, W), 0, HALF + 1, dtype=jnp.int32)
    neg = jax.random.bernoulli(kn, 0.5, (N, W))
    xy = rand_rows(kp, N, (2, 1, NLIMB))       # G1-sized affine payload
    pool = jnp.concatenate([xy, xy], axis=0)
    order = jnp.argsort(bucket[:, 0], axis=0).astype(jnp.int32)

    if stages & {"sort", "all"}:
        # full-scalar-set sorts: amortized over W windows
        f1 = jax.jit(lambda b: jnp.argsort(b, axis=0))
        timed(f1, (bucket,), "argsort (N, W) [all W]",
              reseed=lambda i: (bucket + i,))

        iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                                bucket.shape)

        @jax.jit
        def f2(b):
            ds, od = jax.lax.sort((b, iota), dimension=0, num_keys=1)
            return od
        timed(f2, (bucket,), "lax.sort 2-op (N, W) [all W]",
              reseed=lambda i: (bucket + i,))

        @jax.jit
        def f3(b):
            od = jnp.argsort(b, axis=0)
            return jnp.take_along_axis(b, od, axis=0)
        timed(f3, (bucket,), "argsort + take ds [all W]",
              reseed=lambda i: (bucket + i,))

    if stages & {"gather", "all"}:
        @jax.jit
        def g_old(r, rneg, negw, od):
            sel = jnp.where(negw[:, None, None, None], rneg, r)
            rs = jnp.take(sel, od, axis=0)
            return mg._sorted_to_scan_tiles(rs, k, TILE_N)
        timed(g_old, (xy, xy, neg[:, 0], order),
              "old: where+take+tile-transpose",
              reseed=lambda i: (xy, xy, neg[:, 0], (order + i) % N))

        @jax.jit
        def g_new(p, od, negw):
            adj = od + jnp.where(jnp.take(negw, od), N, 0)
            adj_t = adj.reshape(TILE_N, k).T.reshape(-1)
            g = jnp.take(p, adj_t, axis=0)
            return g.reshape(k, TILE_N, 2, 1, NLIMB).transpose(
                0, 2, 3, 4, 1).reshape(k, 2, 1, NLIMB, 1, 8, 128)
        timed(g_new, (pool, order, neg[:, 0]),
              "new: pool-take(adj_t)+transpose",
              reseed=lambda i: (pool, (order + i) % N, neg[:, 0]))

        @jax.jit
        def g_take_only(p, od):
            adj_t = od.reshape(TILE_N, k).T.reshape(-1)
            return jnp.take(p, adj_t, axis=0)
        timed(g_take_only, (pool, order), "take(adj_t) only (no transpose)",
              reseed=lambda i: (pool, (order + i) % N))

        @jax.jit
        def g_transpose_only(rs):
            return rs.reshape(k, TILE_N, 2, 1, NLIMB).transpose(
                0, 2, 3, 4, 1).reshape(k, 2, 1, NLIMB, 1, 8, 128)
        rs0 = jnp.take(pool, order, axis=0)
        timed(g_transpose_only, (rs0,), "payload transpose only",
              reseed=lambda i: (rs0 + i,))

        @jax.jit
        def g_old_transpose_only(rs):
            return mg._sorted_to_scan_tiles(rs, k, TILE_N)
        timed(g_old_transpose_only, (rs0,), "old tile-transpose only",
              reseed=lambda i: (rs0 + i,))

    if stages & {"prefix", "untile", "boundary", "all"}:
        be = mg.PallasBackend(lanes=TILE_N, complete=False)
        tiles0 = jnp.asarray(np.zeros((k, 2, 1, NLIMB, 1, 8, 128),
                                      np.uint32))

    if stages & {"prefix", "all"}:
        @jax.jit
        def pfx(t):
            return mg._prefix_tiles(t, True, False)
        timed(pfx, (tiles0,), "pallas prefix kernel (mixed)",
              reseed=lambda i: (tiles0 + i,))

    if stages & {"untile", "all"}:
        ptiles0 = jnp.asarray(np.zeros((k, 3, 1, NLIMB, 1, 8, 128),
                                       np.uint32))

        @jax.jit
        def unt(t):
            return mg._scan_tiles_to_sorted(t)
        timed(unt, (ptiles0,), "untile prefix (tiles->rows)",
              reseed=lambda i: (ptiles0 + i,))

    if stages & {"boundary", "all"}:
        ptiles0 = jnp.asarray(np.zeros((k, 3, 1, NLIMB, 1, 8, 128),
                                       np.uint32))
        rows0 = jnp.asarray(np.zeros((N, 3, 1, NLIMB), np.uint32))
        idx = jnp.argsort(bucket[:NQ, 0]).astype(jnp.int32) % N

        @jax.jit
        def b_rows(r, ix):
            return jnp.take(r, ix, axis=0)
        timed(b_rows, (rows0, idx), "boundary take from rows",
              reseed=lambda i: (rows0, (idx + i) % N))

        @jax.jit
        def b_tiled(t, ix):
            lane = ix // k
            step = ix % k
            rem = lane % TILE_N
            return t[step, :, :, :, lane // TILE_N, rem // 128, rem % 128]
        timed(b_tiled, (ptiles0, idx), "boundary gather from tiles",
              reseed=lambda i: (ptiles0, (idx + i) % N))

        @jax.jit
        def b_untile_take(t, ix):
            return jnp.take(mg._scan_tiles_to_sorted(t), ix, axis=0)
        timed(b_untile_take, (ptiles0, idx), "untile + boundary take (fused?)",
              reseed=lambda i: (ptiles0, (idx + i) % N))


if __name__ == "__main__":
    main()
