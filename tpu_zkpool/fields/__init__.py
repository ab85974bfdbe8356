"""Multi-limb modular field arithmetic for TPU.

Two modulus families (see SURVEY.md §7.1 L0):

- BN254 Fr (scalar field, the "circuit field" — Poseidon, Merkle, Shamir,
  embedded curve) and BN254 Fp (base field — G1/G2/pairing): 254-bit primes
  represented as 16 x 16-bit limbs in ``uint32`` lanes, Montgomery domain.
  Reference semantics: ``scripts/generate_audit.py:34`` (BN254_P) in the
  reference repo.
- RLWE word field q = 167772161 (= 40 * 2^22 + 1, < 2^28): 2 x 14-bit limb
  Montgomery in pure uint32 (``tpu_zkpool.fields.rlweq``). Reference:
  ``scripts/rlwe_keygen.py:20``.
"""

from tpu_zkpool.fields.bn254 import FR_MOD, FP_MOD
from tpu_zkpool.fields.fctx import FieldCtx, FR, FP
from tpu_zkpool.fields import limbs

__all__ = ["FR_MOD", "FP_MOD", "FieldCtx", "FR", "FP", "limbs"]
