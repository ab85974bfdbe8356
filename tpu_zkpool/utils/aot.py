"""Disk-cached ``jax.export`` modules — skipping re-trace, not just re-compile.

Round-4 measurement (axon v5e, the 2^20 grid-MSM module, 29 MB StableHLO):

- trace + lower:           292 s   (single-threaded Python/MLIR, every process)
- XLA compile, cache miss:  ~40-90 s
- XLA compile, cache hit:    43 s   (the persistent cache DOES work here)
- ``jax.export`` deserialize: 0.0 s

So the per-process wall for the big Pallas limb graphs is TRACING, which
the XLA persistent compile cache cannot skip. This module serializes the
exported (lowered) module to ``~/.cache/tpu_zkpool_aot`` once and replays
it in later processes: the driver's end-of-round bench pays seconds of
deserialization instead of ~5 minutes of re-tracing per MSM size — and
the Groth16 prove family (whose cold path never fit a driver budget,
docs/PLAN.md) gets the same cut for its G1/G2 MSM modules.

Staleness: the cache key includes a content hash of every ``.py`` file in
``tpu_zkpool`` plus the jax version and backend platform, so ANY source
change invalidates every entry (a rebuild costs one trace — correctness
over cleverness). Exported modules also pin the platform; entries are
per-platform by key.
"""

from __future__ import annotations

import functools
import glob
import hashlib
import os

_AOT_DIR = os.path.expanduser("~/.cache/tpu_zkpool_aot")


@functools.lru_cache(maxsize=None)
def source_fingerprint() -> str:
    """Content hash of the tpu_zkpool source tree + jax version."""
    import jax

    h = hashlib.sha256()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                              recursive=True)):
        with open(p, "rb") as f:
            h.update(f.read())
        h.update(p.encode())
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


def enabled() -> bool:
    return os.environ.get("TPUZK_NO_AOT") != "1"


_RESOLVED: dict = {}


def _load_or_export(key: str, fn_and_args_thunk):
    """Resolve ``key`` to a jitted exported call, tracing at most once
    per process (the jitted wrapper is memoized so repeat calls reuse
    its trace of the single opaque exported-call op)."""
    import jax
    from jax import export as jexp

    if key in _RESOLVED:
        return _RESOLVED[key]
    # Entries live under a per-source-fingerprint subdirectory so stale
    # generations (every edit to tpu_zkpool/*.py orphans ~30 MB modules)
    # can be pruned wholesale on the next write.
    gen_dir = os.path.join(_AOT_DIR, source_fingerprint())
    path = os.path.join(gen_dir, f"{key}.jaxexport")
    if os.path.exists(path):
        with open(path, "rb") as f:
            exp = jexp.deserialize(f.read())
    else:
        fn, args = fn_and_args_thunk()
        exp = jexp.export(fn)(*args)
        _prune_stale_generations(gen_dir)
        os.makedirs(gen_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(exp.serialize())
        os.replace(tmp, path)
    _RESOLVED[key] = jax.jit(exp.call)
    return _RESOLVED[key]


def _prune_stale_generations(keep_dir: str) -> None:
    import shutil

    if not os.path.isdir(_AOT_DIR):
        return
    keep = os.path.basename(keep_dir)
    for d in os.listdir(_AOT_DIR):
        full = os.path.join(_AOT_DIR, d)
        if d != keep and os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        elif d.endswith(".jaxexport"):      # pre-subdir flat layout
            try:
                os.remove(full)
            except OSError:
                pass


def cached_call(name: str, fn, example_args, static_args=()):
    """A callable replaying ``fn``'s exported module from disk.

    ``fn`` must be a ``jax.jit``-wrapped function; ``example_args`` are
    the abstract (ShapeDtypeStruct) or concrete arguments to export
    against, INCLUDING any static arguments in their positions. The
    returned callable takes only the array arguments (statics are baked
    into the module). ``name`` plus the shapes/dtypes/statics and the
    source fingerprint form the cache key.
    """
    import jax
    from jax import tree_util as jtu

    shapes = tuple(
        (tuple(a.shape), str(a.dtype))
        for a in jtu.tree_leaves(example_args)
        if hasattr(a, "shape")
    )
    backend = jax.default_backend()
    raw = repr((name, shapes, tuple(map(repr, static_args)), backend,
                source_fingerprint()))
    key = f"{name}-{hashlib.sha256(raw.encode()).hexdigest()[:20]}"
    return _load_or_export(key, lambda: (fn, example_args))
