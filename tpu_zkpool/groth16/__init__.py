"""Groth16 pipeline against the reference's artifact formats.

- ``acir``: parser + solver for Noir ACIR artifacts
  (``noir_circuit/target/shielded_pool_verifier.json`` in the reference) —
  the witness-generation front-end of the prover.
- ``ccs``: parser for sunspot/gnark ``.ccs`` constraint systems.
- ``vk``: parser for gnark ``.vk`` / ``.proof`` / ``.pw`` byte formats
  (reference ``shielded_pool_program/src/instructions/withdraw.rs:13-16``).
- ``verify`` / ``prove``: TPU-side Groth16 verification / proving.
"""
