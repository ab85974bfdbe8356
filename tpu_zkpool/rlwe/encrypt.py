"""RLWE (BFV-style) keygen / encrypt / decrypt on TPU, bit-exact.

Semantics mirror the reference exactly (``scripts/rlwe_keygen.py``,
``scripts/generate_audit.py:487-518``, ``scripts/rlwe_decrypt.py``):

  b = -(a*sk) + e            (keygen, negacyclic mod q)
  c0 = (b*r + e1 + Delta*msg) mod q   (first MSG_SLOTS coefficients kept)
  c1 = (a*r + e2) mod q
  dec: msg[i] = round(centered(c0[i] + (sk*c1)[i]) / Delta) mod t

The negacyclic products run as batched NTTs on TPU; seeded-RNG key/noise
generation stays host-side (bit-exact with Python ``random.Random``).
Batched over a leading axis: encrypt B ciphertexts in one call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.rlweq import Q
from tpu_zkpool.refimpl.rlwe_ref import (
    DELTA, MSG_SLOTS, N, PLAINTEXT_MOD, encode_field_to_bytes,
)
from tpu_zkpool.rlwe import ntt


@jax.jit
def keygen_from_randomness(sk_mod_q, a, e_mod_q):
    """b = -(a*sk) + e mod q. All uint32[..., N] arrays < q."""
    a_sk = ntt.negacyclic_mul(a, sk_mod_q)
    return (Q - a_sk + e_mod_q) % Q


@jax.jit
def encrypt_core(pk_a, pk_b, r_mod_q, e1_mod_q, e2_mod_q, delta_msg):
    """(c0_sparse, c1) from mod-q inputs.

    pk_a/pk_b: uint32[N]; r/e2: uint32[..., N]; e1/delta_msg:
    uint32[..., MSG_SLOTS]. Returns c0 uint32[..., MSG_SLOTS], c1 [..., N].
    """
    br = ntt.negacyclic_mul(pk_b, r_mod_q)
    c0 = (br[..., :MSG_SLOTS] + e1_mod_q + delta_msg) % Q
    ar = ntt.negacyclic_mul(pk_a, r_mod_q)
    c1 = (ar + e2_mod_q) % Q
    return c0, c1


@jax.jit
def decrypt_core(sk_mod_q, c0_sparse, c1):
    """Noisy plaintext slots: round(centered(c0 + sk*c1)/Delta) mod t."""
    sk_c1 = ntt.negacyclic_mul(sk_mod_q, c1)
    noisy = (c0_sparse + sk_c1[..., :MSG_SLOTS]) % Q
    # centered value in (-q/2, q/2]; compute round-half-even like Python's
    # round() on .5-free values — DELTA=655360 divides evenly only at exact
    # halves, where Python rounds to even. noisy_centered = noisy - q if
    # noisy > q//2.
    # q < 2^28 so everything below fits comfortably in int32 (no x64 needed).
    centered = noisy.astype(jnp.int32) - jnp.where(noisy > Q // 2, Q, 0).astype(jnp.int32)
    # round(x / D) with ties-to-even on exact .5 (D even so 2x+D stays exact)
    q2, r2 = jnp.divmod(2 * centered + DELTA, 2 * DELTA)
    tie = (r2 == 0)
    rounded = jnp.where(tie & (q2 % 2 == 1), q2 - 1, q2)
    return (rounded % PLAINTEXT_MOD).astype(jnp.uint32)


# --------------------------------------------------------------- host API

def encode_message(owner_x: int, owner_y: int) -> np.ndarray:
    return np.asarray(
        encode_field_to_bytes(owner_x) + encode_field_to_bytes(owner_y),
        dtype=np.uint32,
    )


def signed_to_mod_q(vals) -> np.ndarray:
    return np.asarray([v % Q for v in vals], dtype=np.uint32)


def decode_message(msg_slots) -> tuple:
    msg = [int(v) for v in np.asarray(msg_slots)]
    x = sum((msg[i] & 0xFF) << (8 * i) for i in range(32))
    y = sum((msg[32 + i] & 0xFF) << (8 * i) for i in range(32))
    return x, y
