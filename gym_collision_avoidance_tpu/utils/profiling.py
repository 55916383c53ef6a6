"""Profiling / step-timing utilities.

The reference has no profiling at all (SURVEY.md §5.1).  These helpers wrap
``jax.profiler`` traces and give honest steady-state step timings
(compile excluded, device-synchronized).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gca_tpu_trace"):
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_step_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
                 **kwargs) -> Dict[str, float]:
    """Steady-state wall time of a jitted step function.

    The function must return its (donated or fresh) state as the first
    output so iterations chain realistically.
    """
    out = None
    state = args[0]
    rest = args[1:]
    for _ in range(warmup):
        out = fn(state, *rest, **kwargs)
        state = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, *rest, **kwargs)
        state = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "steps_per_s": 1.0 / dt}
