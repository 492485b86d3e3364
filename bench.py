"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): multi-person frames/sec/chip at 368x656,
end-to-end on-device (uint8 normalize -> CNN -> grouping -> skeletons),
bs=8 on the flagship MobileNet-thin model, real TPU chip.

Methodology:
  * Input is DEVICE-RESIDENT, matching the reference's fake-input
    benchmarking mode (C++ examples' --fake flag — SURVEY.md §4); this rig
    reaches the chip through a ~35 MB/s development tunnel, so
    host-interleaved numbers would measure the tunnel, not the engine.
  * Timing runs the whole measurement as ONE on-device lax.fori_loop of
    `iters` end-to-end iterations (input perturbed per step so XLA cannot
    hoist the body) reduced to a single scalar — the only honest clock on
    a remote-execution backend where per-call block_until_ready can
    return before work completes.

vs_baseline: BASELINE.json has `published: {}` (empty reference mount), so
the first recorded run under this methodology is the frozen baseline
(bench_baseline.json).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time


def _device_loop_seconds(engine, images, iters: int = 20) -> float:
    """Mean seconds per end-to-end inference, timed as one device loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openpose_plus_tpu.engine import _infer_impl

    infer = functools.partial(_infer_impl, model=engine.model,
                              postproc_cfg=engine.config.postproc)

    @jax.jit
    def loop(params, images, n):
        def body(i, acc):
            # vary the input so the body is not loop-invariant
            out = infer(params, images + i.astype(jnp.uint8))
            return acc + jnp.sum(out.score)
        return jax.lax.fori_loop(0, n, body, 0.0)

    # compile + warmup (materialized so compile time is excluded)
    _ = np.asarray(loop(engine.params, images, 1))
    t1 = time.perf_counter()
    _ = np.asarray(loop(engine.params, images, 1))
    overhead = time.perf_counter() - t1  # dispatch + 1 iter + scalar D2H
    t0 = time.perf_counter()
    _ = np.asarray(loop(engine.params, images, iters + 1))
    total = time.perf_counter() - t0
    return max(total - overhead, 1e-9) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openpose_plus_tpu.config import default_config
    from openpose_plus_tpu.engine import Engine

    rng = np.random.default_rng(0)
    results = {}

    def bench_engine(name, model, hin, win, batch):
        cfg = default_config(model)
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, hin=hin,
                                                    win=win))
        eng = Engine(cfg)
        images = jax.device_put(jnp.asarray(rng.integers(
            0, 255, (batch, hin, win, 3), dtype=np.uint8)))
        dt = _device_loop_seconds(eng, images)
        results[name] = round(batch / dt, 2)

    # headline: BASELINE config #3 (bs=8 @368x656) on the flagship model
    bench_engine("e2e_fps_per_chip_368x656_bs8", "mobilenet_thin", 368, 656, 8)
    # BASELINE config #1: single 368x432 image
    bench_engine("e2e_fps_single_368x432", "mobilenet_thin", 368, 432, 1)
    # BASELINE config #2: VGG19 single image
    bench_engine("e2e_fps_vgg19_single_368x656", "vgg19", 368, 656, 1)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_details.json"), "w") as f:
        json.dump(results, f, indent=2)

    value = results["e2e_fps_per_chip_368x656_bs8"]
    baseline_path = os.path.join(here, "bench_baseline.json")
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))["value"]
    else:
        base = value
        with open(baseline_path, "w") as f:
            json.dump({"metric": "e2e_fps_per_chip_368x656_bs8",
                       "value": value,
                       "note": "first run, device-loop methodology"}, f)
    print(json.dumps({
        "metric": "e2e_fps_per_chip_368x656_bs8",
        "value": value,
        "unit": "frames/s",
        "vs_baseline": round(value / base, 3),
    }))


if __name__ == "__main__":
    main()
