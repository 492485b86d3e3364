"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): multi-person frames/sec/chip at 368x656,
end-to-end on-device (uint8 normalize -> CNN -> grouping -> skeletons),
bs=8 on the flagship MobileNet-thin model, real TPU chip.

Methodology:
  * Input is DEVICE-RESIDENT, matching the reference's fake-input
    benchmarking mode (C++ examples' --fake flag — SURVEY.md §4); this rig
    reaches the chip through a ~35 MB/s development tunnel, so
    host-interleaved numbers would measure the tunnel, not the engine.
  * Timing chains `iters` end-to-end iterations through a scalar data
    dependence (each step perturbs the next input) and ends in one tiny
    D2H fetch — the only honest clock on a remote-execution backend where
    per-call block_until_ready can return before work completes.

vs_baseline: BASELINE.json has `published: {}` (empty reference mount), so
the first recorded run under this methodology is the frozen baseline
(bench_baseline.json).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time


def _device_loop_seconds(engine, images, repeats: int = 3,
                         target_seconds: float = 0.15) -> float:
    """Best mean seconds per end-to-end inference over `repeats` passes.

    Iterations are chained through a scalar data dependence (the previous
    result perturbs the next input), so the device MUST execute them
    sequentially and the final tiny D2H forces completion of all of them —
    honest timing on a remote-execution backend where per-call
    block_until_ready can return early. Python-level chaining keeps the
    compiled program the size of ONE engine step (a lax.fori_loop variant
    compiles minutes-long programs on the remote-compile rig).

    The per-pass iteration count is sized from a warm estimate so each
    timed pass runs ~`target_seconds`: constant per-pass overhead (final
    D2H round-trip over the dev tunnel) is amortized below the noise floor
    instead of subtracted. (The r1 harness subtracted a one-shot overhead
    sample from a 20-iteration total; at bs=1 the two are comparable and
    the difference is noise-dominated — that is what produced the spurious
    5766-FPS single-image figure flagged in ADVICE.md. It does not
    reproduce: 200-iteration amortized runs give ~1500-1700 FPS.)

    Best-of-N passes: the shared development rig shows occasional
    multi-second degraded windows (~5x slow); the fastest full pass is the
    engine's actual throughput.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openpose_plus_tpu.engine import preprocess_images
    from openpose_plus_tpu.postproc import decode_maps

    model, pcfg = engine.model, engine.config.postproc

    @jax.jit
    def step(params, images, carry):
        x = preprocess_images(images) + carry * 1e-12  # chain dependence
        out = model.apply(params, x)
        res = decode_maps(out["conf"][-1], out["paf"][-1], pcfg)
        return jnp.sum(res.score)

    carry = jnp.float32(0.0)
    carry = step(engine.params, images, carry)   # compile + warmup
    _ = np.asarray(carry)
    # Warm pass sizes the timed passes (est includes one D2H over 20 iters).
    t0 = time.perf_counter()
    for _ in range(20):
        carry = step(engine.params, images, carry)
    _ = np.asarray(carry)
    est = (time.perf_counter() - t0) / 20
    iters = int(min(300, max(20, round(target_seconds / est))))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(engine.params, images, carry)
        _ = np.asarray(carry)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    import jax

    # Persistent compile cache: the three engine builds dominate bench
    # wall-clock otherwise (XLA recompiles every run on this rig).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from openpose_plus_tpu.config import default_config
    from openpose_plus_tpu.engine import Engine

    rng = np.random.default_rng(0)
    results = {}

    def bench_engine(name, model, hin, win, batch, dtype="bfloat16"):
        cfg = default_config(model)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, hin=hin, win=win, compute_dtype=dtype))
        eng = Engine(cfg, fast_init=True)
        # Engine input layout of record = what the host loader emits for
        # this model (s2d² for the deep-s2d MobileNet stem, s2d for the
        # VGG-family block-grid stems, plain for int8 — common.py).
        shape = cfg.model.input_shape(batch)
        images = jax.device_put(jnp.asarray(rng.integers(
            0, 255, shape, dtype=np.uint8)))
        eng.calibrate(images)  # no-op for float modes
        dt = _device_loop_seconds(eng, images)
        results[name] = round(batch / dt, 2)

    # headline: BASELINE config #3 (bs=8 @368x656) on the flagship model.
    # Printed IMMEDIATELY (engine compiles dominate wall-clock on this rig;
    # the secondary configs below must not delay the headline line).
    bench_engine("e2e_fps_per_chip_368x656_bs8", "mobilenet_thin", 368, 656, 8)

    here = os.path.dirname(os.path.abspath(__file__))
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
    }), flush=True)

    if os.environ.get("BENCH_HEADLINE_ONLY"):
        return
    # secondary configs (recorded in bench_details.json)
    try:
        # BASELINE config #1: single 368x432 image
        bench_engine("e2e_fps_single_368x432", "mobilenet_thin", 368, 432, 1)
        # BASELINE config #2: VGG19 single image
        bench_engine("e2e_fps_vgg19_single_368x656", "vgg19", 368, 656, 1)
        # scaling headroom beyond the bs=8 headline (serving batch)
        bench_engine("e2e_fps_per_chip_368x656_bs32", "mobilenet_thin",
                     368, 656, 32)
        # calibrated int8 serving (TensorRT int8 analogue): wins on the
        # FLOPs-bound dense VGG (+~30%); NOT used for mobilenet, which is
        # bandwidth-bound and regresses under int8 (measured; see README)
        bench_engine("e2e_fps_vgg19_int8_368x656_bs8", "vgg19",
                     368, 656, 8, dtype="int8")
        # rest of the model zoo (reference models_vggtiny / hao28)
        bench_engine("e2e_fps_vggtiny_368x656_bs8", "vggtiny", 368, 656, 8)
        bench_engine("e2e_fps_hao28_368x656_bs8", "hao28", 368, 656, 8)
    finally:
        with open(os.path.join(here, "bench_details.json"), "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
