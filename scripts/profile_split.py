"""Split-profile the headline bench: CNN forward vs on-device decode.

Chained-dependence timing (same methodology as bench.py) for
  1. forward only          (uint8 preprocess + CNN)
  2. forward + decode      (the full engine step = headline)
  3. decode only           (on fixed maps)
so we can see where the milliseconds go before optimizing.
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
from openpose_plus_tpu.postproc import decode_maps

MODEL = os.environ.get("PROF_MODEL", "mobilenet_thin")
HIN, WIN, BATCH = 368, 656, 8


def main():
    cfg = default_config(MODEL)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, hin=HIN, win=WIN))
    eng = Engine(cfg, fast_init=True)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (BATCH, HIN, WIN, 3), dtype=np.uint8)))
    model, pcfg = eng.model, cfg.postproc

    @jax.jit
    def fwd_only(params, images, carry):
        x = preprocess_images(images) + carry * 1e-12
        out = model.apply(params, x)
        return jnp.sum(out["conf"][-1].astype(jnp.float32)) + \
            jnp.sum(out["paf"][-1].astype(jnp.float32)) * 1e-6

    @jax.jit
    def full(params, images, carry):
        x = preprocess_images(images) + carry * 1e-12
        out = model.apply(params, x)
        res = decode_maps(out["conf"][-1], out["paf"][-1], pcfg)
        return jnp.sum(res.score)

    # decode-only on fixed maps
    out0 = jax.jit(lambda p, im: model.apply(p, preprocess_images(im)))(
        eng.params, images)
    conf0 = jnp.asarray(out0["conf"][-1], jnp.float32)
    paf0 = jnp.asarray(out0["paf"][-1], jnp.float32)

    @jax.jit
    def dec_only(conf, paf, carry):
        res = decode_maps(conf + carry * 1e-12, paf, pcfg)
        return jnp.sum(res.score)

    t_fwd = timed(fwd_only, eng.params, images)
    t_full = timed(full, eng.params, images)
    t_dec = timed(dec_only, conf0, paf0)
    print(f"model={MODEL} bs={BATCH} {HIN}x{WIN}")
    print(f"forward-only : {t_fwd*1e3:8.2f} ms  ({BATCH/t_fwd:7.1f} fps)")
    print(f"full engine  : {t_full*1e3:8.2f} ms  ({BATCH/t_full:7.1f} fps)")
    print(f"decode-only  : {t_dec*1e3:8.2f} ms  ({BATCH/t_dec:7.1f} fps)")
    print(f"decode share of full: {100*(t_full-t_fwd)/t_full:5.1f}% (by diff)")


if __name__ == "__main__":
    main()
