"""Poseidon / Poseidon2 hashing for BN254.

- ``poseidon_params``: Grain-LFSR generation of the circomlib-compatible
  Poseidon round constants and Cauchy MDS matrices (no vendored tables; the
  constants are re-derived from the published generation procedure and
  validated against the reference repo's committed Merkle sibling chain,
  ``client/prover-params.toml:14-31``).
- ``poseidon``: batched Poseidon permutation + hash2/hash3/hash4 on TPU.
- ``poseidon2``: Poseidon2 (t=4) permutation + the rate-3 sponge used for
  ct_commitment (reference ``ct_helper/src/main.nr:15-34``).
"""
