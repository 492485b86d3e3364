"""Device-trace the train step and print the top HLO fusions by time.

Captures a jax.profiler trace of N chained train steps (one device
program — the bench_train fori loop), parses the TraceViewer JSON, and
aggregates device-side 'X' events by name with their op_name metadata —
per-fusion us/step attribution for backward-pass optimization.

    python scripts/trace_train_step.py [--model mobilenet_thin]
        [--batch 8] [--n 10] [--top 30] [--engine]  (--engine traces the
        inference step instead)
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import gzip
import json
import os
import tempfile

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np


def collect(trace_dir: str) -> list[dict]:
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def device_pids(events) -> set[int]:
    pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))):
            pids.add(e["pid"])
    if not pids:  # fall back: pids that have 'X' events with op args
        for e in events:
            if e.get("ph") == "X" and "args" in e:
                pids.add(e["pid"])
    return pids


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mobilenet_thin")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hin", type=int, default=368)
    ap.add_argument("--win", type=int, default=656)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--engine", action="store_true",
                    help="trace the inference engine step instead")
    ap.add_argument("--dtype", default=None,
                    help="compute dtype override (e.g. int8, bfloat16)")
    args = ap.parse_args()

    from openpose_plus_tpu.config import default_config

    cfg = default_config(args.model)
    mkw = {"hin": args.hin, "win": args.win}
    if args.dtype:
        mkw["compute_dtype"] = args.dtype
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **mkw),
        train=dataclasses.replace(cfg.train, batch_size=args.batch))
    rng = np.random.default_rng(0)

    if args.engine:
        from openpose_plus_tpu.engine import Engine, preprocess_images
        from openpose_plus_tpu.postproc import decode_maps

        eng = Engine(cfg, fast_init=True)
        images = jnp.asarray(rng.integers(
            0, 255, cfg.model.input_shape(args.batch), dtype=np.uint8))
        eng.calibrate(images)  # no-op for float modes
        model, pcfg = eng.model, cfg.postproc

        @jax.jit
        def loop(n, carry):
            def body(_, c):
                x = preprocess_images(images) + c * 1e-12
                out = model.apply(eng.params, x)
                res = decode_maps(out["conf"][-1], out["paf"][-1], pcfg)
                return jnp.sum(res.score)
            return jax.lax.fori_loop(0, n, body, carry)

        run = lambda n, c: loop(n, c)
        carry0 = jnp.float32(0.0)
    else:
        from openpose_plus_tpu import train as T

        state = T.create_train_state(cfg, jax.random.PRNGKey(0))
        tstep = T.make_train_step_on_batch(cfg)
        max_people = 8
        batch = {
            "images": jnp.asarray(rng.integers(
                0, 255, cfg.model.train_lowering().input_shape(args.batch),
                dtype=np.uint8)),
            "keypoints": jnp.asarray(np.concatenate([
                rng.uniform(0, args.win, (args.batch, max_people, 18, 1)),
                rng.uniform(0, args.hin, (args.batch, max_people, 18, 1)),
                (rng.random((args.batch, max_people, 18, 1)) < 0.7),
            ], axis=-1).astype(np.float32)),
            "mask": jnp.ones(
                (args.batch, args.hin // cfg.model.stride,
                 args.win // cfg.model.stride, 1), jnp.float32),
        }

        @jax.jit
        def loop(n, state, carry):
            def body(_, sc):
                st, c = sc
                b = dict(batch)
                b["mask"] = batch["mask"] + c * 1e-12
                st, metrics = tstep(st, b)
                return (st, metrics["loss"])
            return jax.lax.fori_loop(0, n, body, (state, carry))[1]

        run = lambda n, c: loop(n, state, c)
        carry0 = jnp.float32(0.0)

    # warm/compile outside the trace
    _ = np.asarray(run(2, carry0))

    trace_dir = tempfile.mkdtemp(prefix="pose_trace_")
    with jax.profiler.trace(trace_dir):
        _ = np.asarray(run(args.n, carry0))

    events = collect(trace_dir)
    pids = device_pids(events)
    agg: dict[str, list] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        a = e.get("args", {})
        key = a.get("long_name") or a.get("op_name") or name
        rec = agg.setdefault(name, [0.0, 0, key])
        rec[0] += dur
        rec[1] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"device total: {total / args.n / 1e3:.3f} ms/step over "
          f"{args.n} steps   (trace: {trace_dir})")
    for name, (dur, cnt, meta) in rows[:args.top]:
        print(f"{dur / args.n:9.1f} us/step  x{cnt:4d}  {name[:60]:60s} "
              f"{str(meta)[:90]}")


if __name__ == "__main__":
    main()
