"""Shared profiling harness for the scripts/profile_*.py instruments.

Same methodology as bench.py (jitted fori-loop with chained data
dependence + one tiny D2H, per-iteration time from a two-point slope that
cancels the rig's per-dispatch latency); kept in one place so a
methodology fix lands everywhere at once.
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


def timed(step, *args, repeats: int = 3,
          target_seconds: float = 0.25) -> float:
    """Best in-program seconds/iteration of `step(*args, carry)`.

    `step` must fold `carry` into its computation (e.g. `x + carry * 1e-12`
    — NOT `carry * 0`, which XLA constant-folds, breaking the chain) and
    return a scalar. The step runs inside ONE jitted lax.fori_loop and the
    per-iteration time is the two-point slope across a short and a long
    trip count (bench.fori_slope_seconds) — immune to the rig's
    per-dispatch latency (~80 us .. ~2.5 ms depending on the window),
    which used to make tiny ops look 5-10x worse than their in-jit cost.
    First use of a new step compiles its loop (one-time; persistent
    cache).
    """
    import jax
    import jax.numpy as jnp

    from bench import fori_slope_seconds

    @jax.jit
    def loop(n, carry, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: step(*a, c), carry)

    return fori_slope_seconds(lambda n, c: loop(n, c, *args),
                              jnp.float32(0.0), repeats=repeats,
                              target_seconds=target_seconds)


def timed_dispatch(step, *args, iters: int = 20, repeats: int = 3) -> float:
    """Legacy host-chained variant of `timed` (one dispatch per iteration,
    overhead-subtracted). Its numbers include the rig's per-dispatch
    latency — only useful for measuring dispatch itself."""
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
