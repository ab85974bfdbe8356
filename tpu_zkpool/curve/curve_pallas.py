"""Register-limb BN254 Fp helpers shared by the grid-MSM Pallas kernels.

Same technique as the Poseidon kernel (``hash/poseidon_pallas.py``): every
16-bit limb lives in its own vector register; sub/double/zero-test are
lane-wise VPU ops with no HBM round-trips. ``msm/grid.py`` composes these
into the Jacobian point formulas inside its prefix/wsum/Horner kernels.
(The round-1 standalone add/dbl kernels that lived here were retired with
``msm/pippenger.py`` in round 3 — grid kernels fuse the formulas instead.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu_zkpool.fields.fctx import FP
from tpu_zkpool.fields.limbs import NLIMB, MASK, WBITS
from tpu_zkpool.hash.poseidon_pallas import _add_mod

_PJ = [np.uint32(v) for v in FP.p_limbs]


def _sub_mod(a, b):
    """a - b mod p on limb lists."""
    borrow = jnp.zeros_like(a[0])
    diff = []
    for i in range(NLIMB):
        d = a[i] - b[i] - borrow
        borrow = d >> 31
        diff.append(d & MASK)
    # add p back when borrowed
    carry = jnp.zeros_like(a[0])
    padd = []
    for i in range(NLIMB):
        v = diff[i] + _PJ[i] + carry
        padd.append(v & MASK)
        carry = v >> WBITS
    return [jnp.where(borrow == 1, pa, d) for pa, d in zip(padd, diff)]


def _dbl_mod(a):
    return _add_mod(a, a, _PJ)


def _is_zero(a):
    acc = a[0]
    for i in range(1, NLIMB):
        acc = acc | a[i]
    return acc == 0
