"""JAX runtime setup: persistent compilation cache.

Full-size model compiles take minutes (more through remote-compile tunnels);
the persistent cache makes every shape a one-time cost per machine. Enabled
automatically by the processors; call ``enable_cache()`` early elsewhere.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

log = logging.getLogger(__name__)

_enabled = False


def enable_cache(cache_dir: str | None = None) -> str | None:
    global _enabled
    if _enabled:
        return None
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VFX_JAX_CACHE_DIR",
        str(Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
            / "variantformer_tpu" / "jax"),
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
        return cache_dir
    except Exception as exc:
        log.warning("could not enable the JAX compilation cache: %s", exc)
        return None
