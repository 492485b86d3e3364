"""Reproduce the ADVICE.md r1 finding: bs=1 368x432 FPS variance.

Runs the CURRENT bench methodology (jitted fori-loop + two-point slope)
against host-chained dispatch loops, several times each, on the real chip.
The host-chained numbers swing with the rig's per-dispatch latency
(~80 us .. ~2.5 ms between windows); the fori-loop slope does not.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openpose_plus_tpu.config import default_config
from openpose_plus_tpu.engine import Engine, preprocess_images
from openpose_plus_tpu.postproc import decode_maps

from bench import _device_loop_seconds

cfg = default_config("mobilenet_thin")
cfg = cfg.replace(model=dataclasses.replace(cfg.model, hin=368, win=432))
eng = Engine(cfg, fast_init=True)
rng = np.random.default_rng(0)
shape = cfg.model.input_shape(1)
images = jax.device_put(jnp.asarray(rng.integers(0, 255, shape, dtype=np.uint8)))

model, pcfg = eng.model, eng.config.postproc


@jax.jit
def step(params, images, carry):
    x = preprocess_images(images) + carry * 1e-12
    out = model.apply(params, x)
    res = decode_maps(out["conf"][-1], out["paf"][-1], pcfg)
    return jnp.sum(res.score)


carry = jnp.float32(0.0)
carry = step(eng.params, images, carry)
_ = np.asarray(carry)

print("=== current methodology (fori-loop two-point slope, best-of-3) ===")
for trial in range(5):
    dt = _device_loop_seconds(eng, images, repeats=3)
    print(f"trial {trial}: {1.0/dt:9.1f} FPS   ({dt*1e3:.3f} ms/frame)")

print("=== host-chained two-point slope (pays per-dispatch latency) ===")


def slope_seconds(n_small=10, n_large=110, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        global carry
        t0 = time.perf_counter()
        for _ in range(n_small):
            carry = step(eng.params, images, carry)
        _ = np.asarray(carry)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_large):
            carry = step(eng.params, images, carry)
        _ = np.asarray(carry)
        t_large = time.perf_counter() - t0
        best = min(best, max(t_large - t_small, 1e-9) / (n_large - n_small))
    return best


for trial in range(5):
    dt = slope_seconds()
    print(f"trial {trial}: {1.0/dt:9.1f} FPS   ({dt*1e3:.3f} ms/frame)")

print("=== raw totals, 200 chained iters (no subtraction) ===")
for trial in range(3):
    t0 = time.perf_counter()
    for _ in range(200):
        carry = step(eng.params, images, carry)
    _ = np.asarray(carry)
    total = time.perf_counter() - t0
    print(f"trial {trial}: total {total*1e3:8.1f} ms -> {200/total:9.1f} FPS upper-bound-inclusive")
