"""RLWE (N=1024, q=167772161) negacyclic polynomial arithmetic on TPU.

- ``ntt``: radix-2 negacyclic NTT (psi-twist) over the NTT-friendly prime q —
  the TPU replacement for the reference's O(N^2) schoolbook loops
  (``scripts/rlwe_keygen.py:32-42``, ``demo-frontend/app/lib/rlwe.ts:36-57``).
- ``encrypt``: batched keygen/encrypt/decrypt with bit-exact semantics.
- ``quotient``: integer quotient-witness computation (audit circuit).
"""
