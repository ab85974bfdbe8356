"""Shielded-pool protocol layer.

Host-side state machine and flows with the reference's exact byte layouts
(``shielded_pool_program/src/state.rs``, ``instructions/*.rs``), driving
batched TPU verification/proving underneath. See:

- ``state``: pool account state (root ring buffer, nullifier set, audit
  records, vault) and instruction byte formats.
- ``flows``: deposit / withdraw / submit-audit flows + witness assembly.
- ``relayer``: audit-then-withdraw batch driver (the reference's relayer
  API semantics, ``demo-frontend/app/api/relay/withdraw/route.ts``).
"""
