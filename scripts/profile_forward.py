"""Split-profile the MobileNet-thin forward: backbone vs stage heads.

Chained-dependence timing (same methodology as bench.py) for
  1. full forward (preprocess + backbone + 6-stage head)
  2. backbone+feature only (head truncated via n_stages=1 and =0-proxy)
  3. forwards at n_stages in {1..6}
so we can see which section owns the milliseconds (the stage heads scale
linearly in n_stages; the intercept is the backbone).
"""
from __future__ import annotations

import dataclasses
import os

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

timed = _prof.timed

from openpose_plus_tpu.config import default_config
from openpose_plus_tpu.engine import Engine, preprocess_images

MODEL = os.environ.get("PROF_MODEL", "mobilenet_thin")
HIN, WIN, BATCH = 368, 656, 8


def main():
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (BATCH, HIN, WIN, 3), dtype=np.uint8)))
    times = {}
    for n_stages in (1, 2, 4, 6):
        cfg = default_config(MODEL)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, hin=HIN, win=WIN, n_stages=n_stages))
        eng = Engine(cfg, fast_init=True)
        model = eng.model

        @jax.jit
        def fwd(params, images, carry):
            x = preprocess_images(images) + carry * 1e-12
            out = model.apply(params, x)
            return jnp.sum(out["conf"][-1].astype(jnp.float32)) + \
                jnp.sum(out["paf"][-1].astype(jnp.float32)) * 1e-6

        times[n_stages] = timed(fwd, eng.params, images)
        print(f"n_stages={n_stages}: {times[n_stages]*1e3:7.2f} ms "
              f"({BATCH/times[n_stages]:7.1f} fps)", flush=True)
    # linear fit: t = backbone + n_stages * per_stage
    ks = sorted(times)
    per_stage = (times[ks[-1]] - times[ks[0]]) / (ks[-1] - ks[0])
    backbone = times[ks[0]] - per_stage * ks[0]
    print(f"~backbone(+feature): {backbone*1e3:6.2f} ms; "
          f"per refine stage: {per_stage*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
