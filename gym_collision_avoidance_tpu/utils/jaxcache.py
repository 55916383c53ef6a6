"""Persistent XLA compilation cache for the CLI entry points.

Every curriculum stage, evaluation campaign and benchmark runs as its
own Python process, and each re-pays XLA compiles that dominate wall
time (a curriculum stage is ~12-100 s of training loop inside an
83-220 s wall; a 7-density evaluation campaign compiles 7 programs).
JAX's persistent compilation cache works through the axon remote
backend (measured round 4), so repeat invocations skip straight to
execution.

Opt-out with ``GCA_TPU_NO_COMPILE_CACHE=1``; relocate with
``GCA_TPU_COMPILE_CACHE_DIR``.  Scripts call this; the library never
mutates global JAX config on import.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache() -> str | None:
    """Point JAX's compilation cache at a persistent directory.

    Call AFTER ``import jax`` and before the first jit compilation.
    Returns the cache dir, or None if disabled.
    """
    if os.environ.get("GCA_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    d = os.environ.get(
        "GCA_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gca_tpu_xla"),
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache anything that takes real compile time; tiny programs stay
    # in-memory only
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
