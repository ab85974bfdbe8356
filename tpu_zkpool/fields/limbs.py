"""Host-side conversions between Python ints and TPU limb arrays.

Canonical representation for 254-bit field elements on TPU:
``uint32[..., 16]`` — 16 little-endian limbs of 16 bits each (2^256 range).
Products of two 16-bit limbs fit exactly in a uint32 lane, which is the whole
point: the TPU VPU has no 64-bit integer multiplier, so all wide arithmetic is
built from 16x16->32-bit partial products (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

import numpy as np

NLIMB = 16
WBITS = 16
MASK = (1 << WBITS) - 1


def int_to_limbs(x: int, nlimb: int = NLIMB, wbits: int = WBITS) -> np.ndarray:
    """Encode a non-negative Python int as little-endian limbs (uint32)."""
    assert x >= 0
    out = np.zeros((nlimb,), dtype=np.uint32)
    mask = (1 << wbits) - 1
    for i in range(nlimb):
        out[i] = x & mask
        x >>= wbits
    assert x == 0, "value does not fit in limbs"
    return out


def limbs_to_int(limbs, wbits: int = WBITS) -> int:
    """Decode little-endian limbs (last axis) to a Python int."""
    limbs = np.asarray(limbs)
    assert limbs.ndim == 1
    x = 0
    for i in range(limbs.shape[0] - 1, -1, -1):
        x = (x << wbits) | int(limbs[i])
    return x


def ints_to_limbs(xs, nlimb: int = NLIMB, wbits: int = WBITS) -> np.ndarray:
    """Encode a sequence (or nested sequence) of ints -> uint32[..., nlimb].

    Fast path for the canonical 16-bit layout: each int serializes once via
    ``int.to_bytes`` (CPython C code) and the limb split is a vectorized
    uint16 view — ~30x faster than the per-limb Python loop, which used to
    dominate the device-prover's warm path (witness/H-coefficient uploads).
    """
    xs = np.asarray(xs, dtype=object)
    flat = xs.reshape(-1)
    if wbits == 16:
        nbytes = 2 * nlimb
        buf = b"".join(int(v).to_bytes(nbytes, "little") for v in flat.tolist())
        out = (np.frombuffer(buf, dtype="<u2")
               .reshape(flat.shape[0], nlimb).astype(np.uint32))
    else:
        out = np.zeros((flat.shape[0], nlimb), dtype=np.uint32)
        for k, v in enumerate(flat):
            out[k] = int_to_limbs(int(v), nlimb, wbits)
    return out.reshape(xs.shape + (nlimb,))


def pack_limbs16(limbs: np.ndarray) -> np.ndarray:
    """uint32[..., 16] canonical 16-bit limbs -> uint32[..., 8] with two
    limbs per word (limb 2i in the low half, 2i+1 in the high half).

    Host<->device transfers through the axon tunnel are the device
    prover's warm-path wall at 1M+ constraint sizes (~37 MB/s measured);
    packing halves every limb-array upload. The device-side inverse is
    :func:`unpack_limbs16_jnp`."""
    limbs = np.ascontiguousarray(np.asarray(limbs, dtype=np.uint32))
    assert limbs.shape[-1] % 2 == 0
    lo = limbs[..., 0::2]
    hi = limbs[..., 1::2]
    return (lo | (hi << np.uint32(16))).astype(np.uint32)


def unpack_limbs16_jnp(packed):
    """Device inverse of :func:`pack_limbs16`: uint32[..., 8] ->
    uint32[..., 16] canonical 16-bit limbs. Pure jnp (traceable)."""
    import jax.numpy as jnp

    lo = packed & jnp.uint32(0xFFFF)
    hi = packed >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=-1).reshape(packed.shape[:-1]
                                                + (2 * packed.shape[-1],))


def limbs_to_ints(limbs, wbits: int = WBITS) -> np.ndarray:
    """Decode uint32[..., nlimb] -> object ndarray of Python ints.

    Fast path mirrors :func:`ints_to_limbs`: one ``int.from_bytes`` per
    element over a vectorized uint16 repack (limbs must be canonical,
    i.e. < 2^16, which every device op guarantees).
    """
    limbs = np.asarray(limbs)
    lead = limbs.shape[:-1]
    flat = limbs.reshape(-1, limbs.shape[-1])
    out = np.empty((flat.shape[0],), dtype=object)
    if wbits == 16:
        nbytes = 2 * flat.shape[-1]
        buf = np.ascontiguousarray(flat.astype("<u2")).tobytes()
        for k in range(flat.shape[0]):
            out[k] = int.from_bytes(buf[k * nbytes:(k + 1) * nbytes], "little")
    else:
        for k in range(flat.shape[0]):
            out[k] = limbs_to_int(flat[k], wbits)
    return out.reshape(lead)
