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
    # XLA:CPU cache entries embed host-specific AOT machine code; an entry
    # compiled on a different CPU generation ABORTS the process when executed
    # (cpu_aot_loader machine-feature mismatch -> SIGILL-class crash). The
    # cache dir can outlive the host (network home dirs, re-imaged rigs), so
    # CPU entries go to a per-host-fingerprint subdir. Accelerator backends
    # keep the shared dir: their executables target the device, and losing
    # the warm cache re-triggers multi-minute remote compiles.
    if jax.default_backend() == "cpu":
        import hashlib
        import platform

        feats = platform.machine()
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith(("flags", "Features")):
                        feats += line
                        break
        except OSError:
            pass
        fp = hashlib.sha256(feats.encode()).hexdigest()[:12]
        cache_dir = str(Path(cache_dir) / f"cpu-{fp}")
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
