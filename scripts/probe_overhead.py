"""Measure the fixed per-pass overhead (dispatch + final scalar D2H over
the dev tunnel) vs per-iteration device time, bs=8 @368x656 mobilenet."""
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

cfg = default_config("mobilenet_thin")
cfg = cfg.replace(model=dataclasses.replace(cfg.model, hin=368, win=656))
eng = Engine(cfg, fast_init=True)
rng = np.random.default_rng(0)
images = jax.device_put(jnp.asarray(rng.integers(0, 255, cfg.model.input_shape(8), dtype=np.uint8)))

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

# single step + D2H, repeated: measures overhead + 1 step
print("single step + D2H:")
for _ in range(6):
    t0 = time.perf_counter()
    _ = np.asarray(step(eng.params, images, carry))
    print(f"  {(time.perf_counter()-t0)*1e3:7.2f} ms")

# pure D2H of an existing scalar
print("pure scalar D2H (np.asarray of already-computed carry):")
for _ in range(6):
    t0 = time.perf_counter()
    _ = np.asarray(carry)
    print(f"  {(time.perf_counter()-t0)*1e3:7.2f} ms")

# pass totals at several iteration counts -> least-squares slope
print("pass totals (iters, best-of-3 total ms):")
pts = []
for iters in (10, 20, 40, 80):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(eng.params, images, carry)
        _ = np.asarray(carry)
        best = min(best, time.perf_counter() - t0)
    pts.append((iters, best))
    print(f"  {iters:4d}  {best*1e3:8.2f} ms   naive {8*iters/best:7.1f} FPS")

xs = np.array([p[0] for p in pts], dtype=np.float64)
ys = np.array([p[1] for p in pts], dtype=np.float64)
slope, intercept = np.polyfit(xs, ys, 1)
print(f"LSQ: per-iter {slope*1e3:.3f} ms ({8/slope:.1f} FPS), intercept {intercept*1e3:.2f} ms")
