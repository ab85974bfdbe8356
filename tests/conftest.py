"""Test configuration: force local CPU backend with 8 virtual devices.

Real-TPU access in this environment goes through a remote tunnel (slow per-op
dispatch); tests run on the CPU backend for speed and determinism, with an
8-device virtual mesh for multi-chip sharding tests (SURVEY.md §4). bench.py
is the TPU-side entry point.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Heavy graphs (full grid MSM, sharded kernels) compile once per machine.
from tpu_zkpool.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()
