"""Shared profiling harness for the scripts/profile_*.py instruments.

Same methodology as bench.py (chained data dependence + one tiny D2H,
best-of-N passes to ride out the dev rig's degraded windows); kept in one
place so a methodology fix lands everywhere at once.
"""
from __future__ import annotations

import os
import sys
import time


def setup_cache() -> None:
    # repo root on sys.path so profile scripts can import the package
    # however they are launched
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(step, *args, iters: int = 20, repeats: int = 3) -> float:
    """Best mean seconds/iteration of `step(*args, carry)` over N passes.

    `step` must fold `carry` into its computation (e.g. `x + carry * 1e-12`
    — NOT `carry * 0`, which XLA constant-folds, breaking the chain) and
    return a scalar.
    """
    import jax.numpy as jnp
    import numpy as np

    carry = jnp.float32(0.0)
    carry = step(*args, carry)          # compile + warmup
    _ = np.asarray(carry)
    best = float("inf")
    for _ in range(repeats):
        t1 = time.perf_counter()
        _ = np.asarray(step(*args, carry))
        overhead = time.perf_counter() - t1
        t0 = time.perf_counter()
        for _ in range(iters + 1):
            carry = step(*args, carry)
        _ = np.asarray(carry)
        total = time.perf_counter() - t0
        best = min(best, max(total - overhead, 1e-9) / iters)
    return best
