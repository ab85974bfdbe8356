"""tpu_zkpool — TPU-native cryptographic primitive library.

A brand-new JAX / XLA / Pallas framework with the capabilities of the
reference shielded-pool stack (Ham3798/shielded-pool-pinocchio-solana):

- BN254 Fr/Fp multi-limb Montgomery field arithmetic (``tpu_zkpool.fields``)
- Poseidon (circomlib-compatible) and Poseidon2 hashing (``tpu_zkpool.hash``)
- Depth-16 Poseidon Merkle trees with batched updates (``tpu_zkpool.merkle``)
- Embedded-curve (y^2 = x^3 - 17 over Fr) scalar multiplication
  and BN254 G1/G2 + pairing (``tpu_zkpool.curve``)
- Pippenger MSM sharded over TPU meshes (``tpu_zkpool.msm``)
- RLWE (N=1024, q=167772161) negacyclic encryption + NTT (``tpu_zkpool.rlwe``)
- Shamir 2-of-3 secret sharing over BN254 (``tpu_zkpool.shamir``)
- Groth16 verification / proving against gnark artifact formats
  (``tpu_zkpool.groth16``)
- Shielded-pool protocol state machine and flows (``tpu_zkpool.protocol``)

Everything is bit-exact against the reference repo's committed test vectors
(see tests/), and designed TPU-first: batched uint32 limb arithmetic on the
VPU, MXU matmuls where shapes allow, and ICI collectives for multi-chip
scaling.
"""

__version__ = "0.1.0"
