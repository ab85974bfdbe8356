from tpu_zkpool.merkle.tree import MerkleTree, build_levels, default_hashes

__all__ = ["MerkleTree", "build_levels", "default_hashes"]
