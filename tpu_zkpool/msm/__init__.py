from tpu_zkpool.msm.pippenger import msm, msm_sharded

__all__ = ["msm", "msm_sharded"]
