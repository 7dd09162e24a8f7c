"""Persistent XLA compilation cache.

Full-train-step compiles through the tunneled TPU backend take 3-8 minutes
and were paid once per PROCESS all round (docs/NOTES_ROUND1.md "the cache
does not persist across processes" — wrong: `jax_compilation_cache_dir` was
simply never set; a probe on the axon backend shows cross-process hits,
1.02 s -> 0.06 s). Every entry point calls this before first jax use.

Opt out with FREEGAUSSIAN_COMPILE_CACHE=0 (e.g. to time cold compiles);
override the location with FREEGAUSSIAN_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os

# Per-user default: a fixed path in world-writable /tmp can be pre-created
# (squatted) by another user on a shared machine — cache poisoning or
# permission failures — and is lost on reboot.
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~/.cache"), "freegaussian_jax_cache"
)


def enable_persistent_cache() -> str | None:
    """Set the JAX persistent compilation cache directory (idempotent).

    Returns the cache dir, or None when disabled. Must run before the first
    jax computation; safe to call multiple times.
    """
    setting = os.environ.get("FREEGAUSSIAN_COMPILE_CACHE", "")
    if setting == "0":
        return None
    cache_dir = setting if setting not in ("", "1") else _DEFAULT_DIR

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min_compile_time (1 s) skips trivial executables; keep it.
    except Exception:
        return None
    return cache_dir
