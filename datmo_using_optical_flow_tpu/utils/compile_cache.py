"""Persistent XLA compilation cache (opt-in for benches and long-running CLIs).

The 1080p pipeline programs take minutes to compile on the tunneled backend
(the Pallas warp custom-call alone is ~47 s; a 4-step chunk program ~12 min).
Enabling JAX's persistent cache makes re-runs of identical programs start in
seconds.  Tests do NOT enable this (they exercise fresh compilation paths).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str | None = None) -> str:
    import jax

    cache_dir = path or os.environ.get("DATMO_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took noticeable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
