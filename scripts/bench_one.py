"""Bench ONE engine config and print one JSON line — the bench.py
methodology (device-resident input, jitted fori-loop two-point slope)
for ad-hoc configs without re-running the whole table.

    python scripts/bench_one.py --model vggtiny --dtype int8
    python scripts/bench_one.py --model mobilenet_thin --batch 32
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mobilenet_thin")
    ap.add_argument("--hin", type=int, default=368)
    ap.add_argument("--win", type=int, default=656)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--chunk", type=int, default=0,
                    help="serve the batch as lax.map over chunk-sized "
                         "sub-batches (one program; see engine.infer_step)")
    ap.add_argument("--frag-merge", action="store_true",
                    help="enable the fragment-merge repair pass "
                         "(PostprocConfig.fragment_merge_rel=0.5) to "
                         "measure its serving cost")
    args = ap.parse_args()

    import jax

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    import bench
    from openpose_plus_tpu.config import default_config
    from openpose_plus_tpu.engine import Engine

    cfg = default_config(args.model)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=args.hin, win=args.win, compute_dtype=args.dtype))
    if args.frag_merge:
        cfg = cfg.replace(postproc=dataclasses.replace(
            cfg.postproc, fragment_merge_rel=0.5))
    eng = Engine(cfg, fast_init=True, chunk=args.chunk)
    rng = np.random.default_rng(0)
    shape = cfg.model.input_shape(args.batch)
    images = jax.device_put(jnp.asarray(
        rng.integers(0, 255, shape, dtype=np.uint8)))
    eng.calibrate(images)  # no-op for float modes
    samples: list = []
    dt = bench._device_loop_seconds(eng, images, samples=samples)
    out = {
        "metric": (f"e2e_fps_{args.model}_{args.dtype}_"
                   f"{args.hin}x{args.win}_bs{args.batch}"
                   + (f"_chunk{args.chunk}" if args.chunk else "")
                   + ("_fm" if args.frag_merge else "")),
        "value": round(args.batch / dt, 2),
        "unit": "frames/s",
        "ms_per_batch": round(dt * 1e3, 3),
        "spread_pct": round(100.0 * (max(samples) - min(samples)) / dt, 1),
    }
    try:
        flops, nbytes = bench.program_cost(eng._infer, eng.params, images)
        out.update(bench.utilization_row(flops, nbytes, dt))
    except Exception as e:
        out["cost_analysis_error"] = str(e)[:200]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
