from tpu_zkpool.shamir.shamir import share_batch, reconstruct_batch

__all__ = ["share_batch", "reconstruct_batch"]
