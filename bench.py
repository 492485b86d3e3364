"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): multi-person frames/sec/chip at 368x656,
end-to-end on-device (uint8 normalize -> CNN -> grouping -> skeletons),
bs=8 on the flagship MobileNet-thin model, real TPU chip.

Methodology:
  * Input is DEVICE-RESIDENT, matching the reference's fake-input
    benchmarking mode (C++ examples' --fake flag — SURVEY.md §4); this rig
    reaches the chip through a ~35 MB/s development tunnel, so
    host-interleaved numbers would measure the tunnel, not the engine.
  * The timed unit is ONE jitted `lax.fori_loop` running N end-to-end
    iterations chained through a scalar data dependence (each step
    perturbs the next input) and ending in one tiny D2H fetch. A
    two-point slope — (t(N_large) − t(N_small)) / (N_large − N_small) —
    cancels the fixed dispatch+round-trip cost exactly, so the number is
    the engine's in-program step time regardless of how slow the dev
    tunnel happens to be that day (measured: per-call dispatch swings
    ~80 us .. ~2.5 ms between rig windows, which is why earlier
    host-chained methodologies produced the unstable bs=1 figures flagged
    in ADVICE.md r1; the fori-loop slope reproduces within a few percent
    across those same windows).

vs_baseline: BASELINE.json has `published: {}` (empty reference mount), so
the first recorded run under this methodology is the frozen baseline
(bench_baseline.json).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time


# TPU v5e (v5 lite) per-chip peaks — the denominators of the MFU /
# roofline columns (same constants as docs/ARCHITECTURE.md's per-fusion
# roofline analysis). bf16 MXU peak and HBM bandwidth.
PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBPS = 819.0


def program_cost(jitted, *args) -> tuple[float, float]:
    """(flops, hbm bytes) of ONE execution of a jitted program, from XLA's
    own per-op analytic cost model (compiled.cost_analysis()): conv/matmul
    FLOPs are exact for static shapes; 'bytes accessed' counts bytes at
    fusion boundaries — an UPPER BOUND on physical DRAM traffic, since
    buffers resident in on-chip/alternate memory are still counted.
    hbm_pct_est can therefore exceed 100 on models whose working set fits
    there (measured: the mobilenet engine reports ~135); it is a traffic
    bound for cross-row comparison, not a measured DMA rate — the
    measured per-fusion rates live in docs/ARCHITECTURE.md's trace
    analysis."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):   # older JAX returned [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def utilization_row(flops: float, nbytes: float, dt: float) -> dict:
    """Achieved TFLOP/s + %%-of-MXU-peak (MFU) and estimated HBM GB/s +
    %%-of-bandwidth-roofline for one program execution taking dt seconds."""
    tflops = flops / dt / 1e12
    gbps = nbytes / dt / 1e9
    return {
        "flops_per_exec": flops,
        "achieved_tflops": round(tflops, 2),
        "mfu_pct": round(100.0 * tflops / PEAK_TFLOPS_BF16, 1),
        "hbm_gbps_est": round(gbps, 1),
        "hbm_pct_est": round(100.0 * gbps / PEAK_HBM_GBPS, 1),
    }


def fori_slope_seconds(loop_fn, carry0, repeats: int = 3,
                       target_seconds: float = 0.4,
                       samples: list | None = None) -> float:
    """Best in-program seconds per iteration of a jitted device loop.

    `loop_fn(n, carry) -> carry` must run n chained iterations of the
    measured step inside ONE jitted `lax.fori_loop` with a DYNAMIC trip
    count (one compilation serves every n; the persistent compile cache
    makes it one-time per config). Chaining through the carry forces the
    device to execute the iterations sequentially, and the single D2H of
    the scalar carry forces completion — honest on a remote-execution
    backend where per-call block_until_ready can return early.

    Per-iteration time is the TWO-POINT SLOPE between a short and a long
    loop: (t(n_large) − t(n_small)) / (n_large − n_small). Both passes pay
    the same fixed cost (dispatch + tunnel round-trip for the final
    scalar), so the slope cancels it exactly instead of estimating it —
    the r1 host-chained harness was at the mercy of the rig's
    per-dispatch latency (~80 us in good windows, ~2.5 ms in bad ones),
    which produced the unstable bs=1 figures flagged in ADVICE.md.

    Robustness (ADVICE.md r2): slope noise is two-sided — a degraded-rig
    spike landing on the SMALL pass makes the slope too small or even
    negative, so min-over-repeats is biased and a non-positive clamp
    would fabricate absurd figures. Instead, non-positive slope samples
    are DISCARDED (with bounded retries) and the reported figure is the
    MEDIAN of the valid samples.
    """
    import numpy as np

    def run(n, carry):
        t0 = time.perf_counter()
        carry = loop_fn(n, carry)
        _ = np.asarray(carry)
        return time.perf_counter() - t0, carry

    _, carry = run(5, carry0)           # compile + warmup
    t_est, carry = run(20, carry)       # sizes the timed passes
    est = t_est / 20
    n_large = int(min(1000, max(40, round(target_seconds / est))))
    n_small = max(5, n_large // 8)
    slopes = []
    for _ in range(3 * repeats):        # bounded retries for bad windows
        t_small, carry = run(n_small, carry)
        t_large, carry = run(n_large, carry)
        dt = (t_large - t_small) / (n_large - n_small)
        if dt > 0:
            slopes.append(dt)
            if len(slopes) >= repeats:
                break
    if not slopes:
        raise RuntimeError(
            "fori_slope_seconds: no positive slope sample in "
            f"{3 * repeats} passes — rig too degraded to measure")
    if samples is not None:
        samples.extend(slopes)          # run-to-run spread for the record
    return float(np.median(slopes))


def _device_loop_seconds(engine, images, repeats: int = 3,
                         target_seconds: float = 0.4,
                         samples: list | None = None) -> float:
    """fori_slope_seconds over the full engine step (preprocess -> CNN ->
    decode), each iteration's input perturbed by the previous result."""
    import jax
    import jax.numpy as jnp

    from openpose_plus_tpu.engine import infer_step

    model, pcfg = engine.model, engine.config.postproc
    chunk = getattr(engine, "chunk", 0)

    def step(params, images, carry):
        # Chain dependence: the select's predicate depends on the previous
        # result (score sums are finite but XLA cannot prove the branch),
        # so iterations execute sequentially; the benched program is the
        # engine's own infer_step — including its chunked lowering.
        images = jnp.where(jnp.isfinite(carry), images,
                           jnp.zeros_like(images))
        res = infer_step(params, images, model=model, postproc_cfg=pcfg,
                         chunk=chunk)
        return jnp.sum(res.score)

    @jax.jit
    def loop(params, images, n, carry):
        return jax.lax.fori_loop(
            0, n, lambda i, c: step(params, images, c), carry)

    return fori_slope_seconds(
        lambda n, c: loop(engine.params, images, n, c),
        jnp.float32(0.0), repeats=repeats, target_seconds=target_seconds,
        samples=samples)


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

    def bench_engine(name, model, hin, win, batch, dtype="bfloat16",
                     chunk=0):
        cfg = default_config(model)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, hin=hin, win=win, compute_dtype=dtype))
        eng = Engine(cfg, fast_init=True, chunk=chunk)
        # Engine input layout of record = what the host loader emits for
        # this model (s2d² for the deep-s2d MobileNet stem, s2d for the
        # VGG-family block-grid stems, plain for int8 — common.py).
        shape = cfg.model.input_shape(batch)
        images = jax.device_put(jnp.asarray(rng.integers(
            0, 255, shape, dtype=np.uint8)))
        eng.calibrate(images)  # no-op for float modes
        samples: list = []
        dt = _device_loop_seconds(eng, images, samples=samples)
        row = {"fps": round(batch / dt, 2), "batch": batch,
               "spread_pct": round(
                   100.0 * (max(samples) - min(samples)) / dt, 1)}
        try:
            # utilization accounting (r4 verdict item #5): FLOPs + bytes of
            # the exact served program, from XLA's cost model. For int8
            # engines mfu_pct stays vs the bf16 peak (int8 MXU peak is 2x,
            # so its true utilization is half the printed figure — the
            # column is for cross-row comparability).
            flops, nbytes = program_cost(eng._infer, eng.params, images)
            row.update(utilization_row(flops, nbytes, dt))
            row["flops_per_image"] = round(flops / batch)
            if chunk:
                # the chunked program is a lax.map whose body the cost
                # model counts ONCE — flops/mfu under-count by ~batch/chunk
                row["cost_note"] = (
                    f"lax.map body counted once: flops/mfu/hbm are "
                    f"~{batch // chunk}x under-counted")
        except Exception as e:   # cost model unavailable: keep FPS row
            row["cost_analysis_error"] = str(e)[:200]
        results[name] = row
        return row

    # headline: BASELINE config #3 (bs=8 @368x656) on the flagship model.
    # Printed IMMEDIATELY (engine compiles dominate wall-clock on this rig;
    # the secondary configs below must not delay the headline line).
    head = bench_engine("e2e_fps_per_chip_368x656_bs8",
                        "mobilenet_thin", 368, 656, 8)

    here = os.path.dirname(os.path.abspath(__file__))
    value = head["fps"]
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
        "mfu_pct": head.get("mfu_pct"),
        "hbm_pct_est": head.get("hbm_pct_est"),
        "spread_pct": head.get("spread_pct"),
    }), flush=True)

    if os.environ.get("BENCH_HEADLINE_ONLY"):
        return
    # secondary configs (recorded in bench_details.json)
    try:
        # BASELINE config #1: single 368x432 image
        bench_engine("e2e_fps_single_368x432", "mobilenet_thin", 368, 432, 1)
        # BASELINE config #2: VGG19 single image
        bench_engine("e2e_fps_vgg19_single_368x656", "vgg19", 368, 656, 1)
        # VGG19 serving batch (the int8 row's bf16 comparison point)
        bench_engine("e2e_fps_vgg19_368x656_bs8", "vgg19", 368, 656, 8)
        # scaling headroom beyond the bs=8 headline (serving batch)
        bench_engine("e2e_fps_per_chip_368x656_bs32", "mobilenet_thin",
                     368, 656, 32)
        # bs=32 served as lax.map over bs=8 sub-batches in ONE program:
        # keeps the working set at the alternate-memory sweet spot
        # (the bs=32 cliff fix — r3 verdict item #5)
        bench_engine("e2e_fps_per_chip_368x656_bs32_chunk8",
                     "mobilenet_thin", 368, 656, 32, chunk=8)
        # calibrated int8 serving (TensorRT int8 analogue): wins on the
        # FLOPs-bound dense VGG (+~30%); NOT used for mobilenet, which is
        # bandwidth-bound and regresses under int8 (measured; see README)
        bench_engine("e2e_fps_vgg19_int8_368x656_bs8", "vgg19",
                     368, 656, 8, dtype="int8")
        # rest of the model zoo (reference models_vggtiny / hao28)
        bench_engine("e2e_fps_vggtiny_368x656_bs8", "vggtiny", 368, 656, 8)
        bench_engine("e2e_fps_hao28_368x656_bs8", "hao28", 368, 656, 8)
        # int8 across the dense zoo (r3 verdict item #3): vggtiny/hao28
        # re-measured with the r3 int8 machinery (QAct residency,
        # calibrated scales) — their only previous int8 numbers predate it
        bench_engine("e2e_fps_vggtiny_int8_368x656_bs8", "vggtiny",
                     368, 656, 8, dtype="int8")
        bench_engine("e2e_fps_hao28_int8_368x656_bs8", "hao28",
                     368, 656, 8, dtype="int8")
        # the depthwise model's int8 row, MEASURED (r4 verdict item #8):
        # previously asserted FPS-negative from the depthwise-int8
        # microbenchmark alone; this keeps the claim attached to a number
        bench_engine("e2e_fps_mobilenet_int8_368x656_bs8", "mobilenet_thin",
                     368, 656, 8, dtype="int8")
    finally:
        # The standing repo record is refreshed DELIBERATELY (committed in
        # the same change that quotes it): default the details dump to /tmp
        # so automated round-end bench runs leave the working tree clean
        # (the r3/r4 recurring hygiene finding). Set BENCH_DETAILS_PATH to
        # the repo file to refresh the record.
        details = os.environ.get(
            "BENCH_DETAILS_PATH",
            os.path.join("/tmp", "bench_details.json"))
        with open(details, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
