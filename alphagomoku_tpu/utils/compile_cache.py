"""Persistent XLA compilation cache.

Every driver entry point (bench.py, __graft_entry__.py, the test conftest,
training/eval tools) calls :func:`enable_persistent_cache` before the first
jit so repeat compiles of unchanged shapes are served from disk in seconds
instead of minutes.  The cache lives in ``.jax_cache/`` at the repo root
(untracked); keys include backend + jax version, so CPU-mesh dryruns and
TPU bench runs coexist in one directory.

The reference has no analogue (single-process C++, no JIT); this is the
TPU-native equivalent of shipping pre-built binaries: the evidence pipeline
(BENCH/MULTICHIP artifacts) must never pay a cold multi-minute XLA compile
twice for the same shape.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at *path* (default
    ``<repo>/.jax_cache``).  Safe to call multiple times and before/after
    backend init; returns the cache directory."""
    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    os.makedirs(cache_dir, exist_ok=True)
    # env var so subprocesses (bench configs, selfplay workers) inherit it
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable time; entries are keyed by
    # computation hash so small entries are harmless
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
