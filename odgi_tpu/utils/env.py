"""Runtime environment helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache") -> None:
    """Persist compiled executables across processes.

    The TPU in this environment sits behind a remote-compile relay that is
    slow and occasionally wedges; a persistent cache makes every re-run of
    an already-seen program instant and immune to relay flakiness.
    """
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
