"""Multi-chip sharded kernels (SURVEY.md §2.4).

- ``ntt_sharded``: coefficient-axis-sharded negacyclic NTT whose first
  log2(D) butterfly stages exchange shards over ICI (SP/CP analogue).
- ``msm_sharded``: point-axis-sharded Pippenger — local window sums per
  device, one all_gather + fold, a single Horner combine (TP/EP analogue).
"""

from tpu_zkpool.parallel.ntt_sharded import (  # noqa: F401
    forward_sharded, inverse_sharded, negacyclic_mul_sharded,
)
from tpu_zkpool.parallel.msm_sharded import msm_grid_sharded  # noqa: F401
