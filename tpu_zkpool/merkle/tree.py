"""Depth-16 Poseidon Merkle tree with TPU-batched level hashing.

Semantics match the reference client tree exactly
(``client/merkle.ts:146-222``): 2-ary, empty leaf = 0, default hash chain
d0 = 0, d_{k+1} = poseidon2(d_k, d_k); proofs are sibling lists leaf->root.

TPU-first: instead of the reference's O(2^depth) per-call JS recomputation,
a whole level is hashed in ONE batched Poseidon call (pairs laid out on the
batch axis), so a full build is `depth` kernel launches. Additionally a
classic frontier (filled-subtree) accumulator gives true O(log N) work per
``insert``/``get_root`` — proofs use the batched rebuild, roots never do.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.fctx import FR
from tpu_zkpool.fields.limbs import NLIMB
from tpu_zkpool.hash import poseidon
from tpu_zkpool.hash.poseidon_params import poseidon_hash_ref

TREE_DEPTH = 16


@functools.lru_cache(maxsize=None)
def default_hashes(depth: int = TREE_DEPTH) -> tuple:
    """d_0 = 0, d_{k+1} = H(d_k, d_k) — Python ints (host constants)."""
    out = [0]
    for _ in range(depth):
        out.append(poseidon_hash_ref([out[-1], out[-1]]))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _default_mont(depth: int = TREE_DEPTH) -> np.ndarray:
    return FR.to_mont(np.asarray(default_hashes(depth), dtype=object))


@functools.partial(jax.jit, static_argnums=(1,))
def build_levels(leaves: jnp.ndarray, depth: int = TREE_DEPTH):
    """Build all tree levels from uint32[N, 16] Montgomery leaves.

    N must be a power of two <= 2^depth; missing subtrees are folded in via
    the default-hash chain. Returns a list of arrays level_k: (N >> k, 16)
    for k = 0..log2(N), plus the final root folded up to `depth`: (16,).
    """
    n = leaves.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    dmont = jnp.asarray(_default_mont(depth))
    levels = [leaves]
    cur = leaves
    k = 0
    while cur.shape[0] > 1:
        cur = poseidon.hash2(cur[0::2], cur[1::2])
        k += 1
        levels.append(cur)
    # fold the single node up to the full depth against default hashes
    root = cur[0]
    for j in range(k, depth):
        root = poseidon.hash2(root, dmont[j])
    return levels, root


class MerkleTree:
    """Incremental append-only tree mirroring ``ShieldedPoolMerkleTree``.

    Host object holding canonical-int leaves; hashing runs in batched JAX
    calls. ``insert`` updates a frontier of filled subtrees (depth host
    hashes, O(log N)); ``get_root`` reads the frontier root in O(1);
    ``get_proof`` rebuilds levels lazily with one batched hash call per
    level.
    """

    def __init__(self, depth: int = TREE_DEPTH):
        self.depth = depth
        self.leaves: list[int] = []
        self._levels_cache = None
        self._filled: list[int] = [0] * depth   # left-sibling per level
        self._root: int = default_hashes(depth)[depth]

    def insert(self, commitment: int) -> int:
        """Append a leaf; O(log N): one frontier pass of `depth` hashes."""
        index = len(self.leaves)
        leaf = commitment % FR.modulus
        self.leaves.append(leaf)
        self._levels_cache = None
        dh = default_hashes(self.depth)
        cur, i = leaf, index
        for k in range(self.depth):
            if i % 2 == 0:
                self._filled[k] = cur
                cur = poseidon_hash_ref([cur, dh[k]])
            else:
                cur = poseidon_hash_ref([self._filled[k], cur])
            i //= 2
        self._root = cur
        return index

    # ------------------------------------------------------------------

    def _padded_leaf_count(self) -> int:
        n = max(1, len(self.leaves))
        p = 1
        while p < n:
            p <<= 1
        return p

    def _levels(self):
        """Compute levels as canonical ints (cached until next insert)."""
        if self._levels_cache is not None:
            return self._levels_cache
        dh = default_hashes(self.depth)
        pad = self._padded_leaf_count()
        padded = self.leaves + [0] * (pad - len(self.leaves))
        leaves_mont = jnp.asarray(FR.to_mont(np.asarray(padded, dtype=object)))
        levels_dev, root_dev = build_levels(leaves_mont, self.depth)
        levels = [
            [int(v) for v in FR.from_mont(np.asarray(lvl))] for lvl in levels_dev
        ]
        # extend with the default-hash folds so levels has depth+1 entries
        top = levels[-1][0]
        k = len(levels) - 1
        for j in range(k, self.depth):
            top = poseidon_hash_ref([top, dh[j]])
            levels.append([top])
        self._levels_cache = levels
        return levels

    def get_root(self) -> int:
        return self._root

    def get_proof(self, index: int) -> list[int]:
        """Sibling list from leaf level to depth-1, default-padded."""
        assert 0 <= index < max(1, len(self.leaves))
        dh = default_hashes(self.depth)
        levels = self._levels()
        proof = []
        idx = index
        for k in range(self.depth):
            sib = idx ^ 1
            level = levels[k] if k < len(levels) else []
            proof.append(level[sib] if sib < len(level) else dh[k])
            idx >>= 1
        return proof

    @staticmethod
    def verify_proof(leaf: int, index: int, proof: list[int], root: int) -> bool:
        cur = leaf
        idx = index
        for sib in proof:
            cur = (
                poseidon_hash_ref([cur, sib])
                if idx % 2 == 0
                else poseidon_hash_ref([sib, cur])
            )
            idx >>= 1
        return cur == root
