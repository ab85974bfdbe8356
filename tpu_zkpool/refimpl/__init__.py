"""Pure-Python (bigint) reference implementations — test oracles.

These mirror the reference repo's semantics exactly (cited per function) and
serve as the ground truth that the TPU (JAX/Pallas) kernels are tested
against, following SURVEY.md §4's test strategy.
"""
