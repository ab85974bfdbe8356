"""Persistent XLA/Mosaic compilation cache.

The Pallas kernels take 1-10 minutes to compile through the remote-compile
tunnel; caching makes that a once-per-machine cost (mirrors the reference's
artifact-level checkpointing of `.ccs`/`.pk` files, SURVEY.md §5).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/tpu_zkpool_jax")


def enable_compile_cache(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
