"""Elliptic curve kernels.

- ``weierstrass``: generic batched Jacobian point arithmetic over any
  ``FieldCtx`` for a = 0 short-Weierstrass curves — instantiated for the
  embedded curve y^2 = x^3 - 17 over Fr (identity keys, reference
  ``client/merkle.ts:44-75``) and for BN254 G1 y^2 = x^3 + 3 over Fp
  (Groth16/MSM).
- ``fp2`` / ``g2`` / ``pairing``: extension towers and the BN254 pairing.
"""
