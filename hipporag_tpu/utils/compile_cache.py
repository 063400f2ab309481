"""Persistent XLA compilation-cache setup (shared by the orchestrators
and bench).

JAX initializes the persistent cache at most once per process — the
first compile after a cache dir is set pins it; later ``config.update``
calls are silently ignored by JAX. ``enable_compilation_cache`` therefore
only applies the first requested directory and logs when a later,
different request cannot take effect.
"""

from __future__ import annotations

import os
from typing import Optional

from .logging import get_logger

logger = get_logger(__name__)

_applied_dir: Optional[str] = None


def enable_compilation_cache(target: Optional[str], save_dir: Optional[str] = None) -> None:
    """Point JAX's persistent compilation cache at ``target``.

    ``"auto"`` resolves to ``<save_dir>/jax_cache``; None/empty disables
    (no-op). Safe to call repeatedly; only the first directory ever
    requested in the process takes effect (JAX once-only semantics).
    """
    global _applied_dir
    if not target:
        return
    if target == "auto":
        if not save_dir:
            return
        target = os.path.join(save_dir, "jax_cache")
    if _applied_dir is not None:
        if os.path.abspath(target) != os.path.abspath(_applied_dir):
            logger.info(
                "compilation cache already pinned to %s; ignoring %s "
                "(JAX initializes the cache once per process)",
                _applied_dir, target,
            )
        return
    try:
        import jax

        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _applied_dir = target
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        logger.warning("compilation cache unavailable: %s", e)
