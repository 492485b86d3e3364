"""Standing synthetic AP benchmark — the quality axis of BASELINE.md.

Trains each zoo model on the seeded TRAIN scene bank and evaluates
keypoint AP on the HELD-OUT val bank (openpose_plus_tpu/data/synthetic.py
— crowds, overlap, 3x scale variation, truncation, clutter) under four
cumulative inference settings, so the AP-improving machinery carries
MEASURED deltas instead of docstring claims:

  base        default PostprocConfig (upsample 2, subpixel refinement)
  fidelity    PostprocConfig.fidelity() (8x maps, 32-peak cap)
  +tta        fidelity + horizontal-flip TTA
  +multiscale fidelity + flip TTA + scale search (0.5, 1.0, 1.5)

Results accumulate in ap_benchmark.json (repo root) keyed by model;
existing (model, variant) entries are skipped unless --force, so the
4-model table can be filled incrementally and any cell re-measured alone.

    python scripts/ap_benchmark.py --model vggtiny          # one row
    python scripts/ap_benchmark.py --all                    # all four
    python scripts/ap_benchmark.py --table                  # markdown

The val split is NEVER trained on (disjoint generator seeds), unlike the
r2 smoke proof which evaluated on its own training images.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS_PATH = os.path.join(HERE, "ap_benchmark.json")
BANK_DIR = os.path.join(HERE, ".ap_bench")

MODELS = ("mobilenet_thin", "vggtiny", "hao28", "vgg19")
VARIANTS = ("base", "fidelity", "fidelity_tta", "fidelity_tta_ms")
EXTRA_VARIANTS = ("fidelity_int8",)  # opt-in via --int8
SCALES = (0.5, 1.0, 1.5)

# Benchmark geometry: 256px scenes letterboxed to 128x128 (16x16 output
# maps at stride 8) — small enough that a full train+eval per model fits
# a dev session, large enough that figures span ~6..19 map pixels.
SIZE, HIN = 256, 128
N_TRAIN, N_VAL = 256, 96


def _load_results() -> dict:
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            return json.load(f)
    return {}


def _save_results(res: dict) -> None:
    with open(RESULTS_PATH, "w") as f:
        json.dump(res, f, indent=2, sort_keys=True)
        f.write("\n")


def build_config(model: str, ann: str, imgs: str, steps: int, lr: float):
    from openpose_plus_tpu.config import default_config

    cfg = default_config(model)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hin=HIN, win=HIN),
        data=dataclasses.replace(
            cfg.data, train_annotations=ann, train_images=imgs,
            num_workers=4, prefetch=4,
            # moderate augmentation: the bank already varies scale/rotation
            rotate_max_deg=15.0, scale_min=0.8, scale_max=1.15,
            shift_frac=0.1, sigma=5.0, limb_width=5.0),
        train=dataclasses.replace(
            cfg.train, batch_size=8, lr_init=lr,
            lr_decay_every=max(steps // 2, 1), lr_decay_factor=0.33,
            weight_decay=0.0, log_every=100, checkpoint_every=10 ** 9,
            checkpoint_dir=os.path.join(BANK_DIR, f"ck_{model}")),
    )
    return cfg


def train_model(model: str, steps: int, lr: float, ann: str, imgs: str):
    """Train on the train bank; returns (cfg, params). Caches params as
    .ap_bench/<model>_s<steps>.npz so eval variants never retrain."""
    import jax

    from openpose_plus_tpu import checkpoint as ckpt
    from openpose_plus_tpu import train as T
    from openpose_plus_tpu.data.coco import CocoPoseDataset
    from openpose_plus_tpu.data.pipeline import TrainPipeline

    cfg = build_config(model, ann, imgs, steps, lr)
    # lr is part of the cache key: rerunning with a different --lr must
    # retrain, not silently reuse weights trained at the old lr.
    npz = os.path.join(BANK_DIR, f"{model}_s{steps}_lr{lr:g}.npz")
    state = T.create_train_state(cfg, jax.random.PRNGKey(0))
    if os.path.exists(npz):
        print(f"[{model}] reusing trained weights {npz}", flush=True)
        return cfg, ckpt.load_npz(npz, state.params)

    dataset = CocoPoseDataset(ann, imgs)
    pipeline = TrainPipeline(dataset, cfg, seed=0)
    step_fn = T.make_train_step_on_batch(cfg)
    it = iter(pipeline)
    t0 = time.perf_counter()
    loss_first = loss_last = None
    for i in range(steps):
        state, metrics = step_fn(state, next(it))
        if i == 0 or i % 100 == 99:
            loss_last = float(metrics["loss"])
            if loss_first is None:
                loss_first = loss_last
            print(f"[{model}] step {i + 1}/{steps}: loss {loss_last:.2f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    pipeline.stop()
    ckpt.save_npz(npz, state.params)
    print(f"[{model}] trained {steps} steps in "
          f"{time.perf_counter() - t0:.0f}s, loss {loss_first:.1f} -> "
          f"{loss_last:.1f}; saved {npz}", flush=True)
    return cfg, state.params


def eval_variant(cfg, params, variant: str, dataset) -> dict:
    from openpose_plus_tpu.engine import Engine
    from openpose_plus_tpu.eval_coco import evaluate_engine

    ecfg = cfg
    if variant != "base":
        ecfg = cfg.replace(postproc=cfg.postproc.fidelity())
    if variant == "fidelity_int8":
        # quantization QUALITY cost (the TensorRT int8-accuracy
        # question): same float weights, int8 engine, scales
        # auto-calibrated on the first eval batch
        ecfg = ecfg.replace(model=dataclasses.replace(
            ecfg.model, compute_dtype="int8"))
    eng = Engine(ecfg, params=params)
    kwargs = {}
    if variant in ("fidelity_tta", "fidelity_tta_ms"):
        kwargs["flip_tta"] = True
    if variant == "fidelity_tta_ms":
        kwargs["scales"] = SCALES
    t0 = time.perf_counter()
    r = evaluate_engine(eng, dataset, batch_size=8, **kwargs)
    return {"ap": round(r.ap, 4), "ap50": round(r.ap50, 4),
            "ap75": round(r.ap75, 4), "ar": round(r.ar, 4),
            "eval_seconds": round(time.perf_counter() - t0, 1)}


def run_model(model: str, steps: int, lr: float, force: bool,
              int8: bool = False) -> None:
    from openpose_plus_tpu.data.coco import CocoPoseDataset
    from openpose_plus_tpu.data.synthetic import make_scene_bank

    train_ann, train_imgs = make_scene_bank(BANK_DIR, "train", N_TRAIN, SIZE)
    val_ann, val_imgs = make_scene_bank(BANK_DIR, "val", N_VAL, SIZE)

    res = _load_results()
    row = res.get(model, {})
    variants = VARIANTS + (EXTRA_VARIANTS if int8 else ())
    missing = [v for v in variants
               if force or v not in row or row[v].get("steps") != steps
               or row[v].get("lr", lr) != lr]
    if not missing:
        print(f"[{model}] all variants recorded (use --force to redo)")
        return

    cfg, params = train_model(model, steps, lr, train_ann, train_imgs)
    val_set = CocoPoseDataset(val_ann, val_imgs)
    for variant in missing:
        out = eval_variant(cfg, params, variant, val_set)
        out.update({"steps": steps, "lr": lr, "n_val": N_VAL, "hin": HIN,
                    "bank_size": SIZE})
        row[variant] = out
        res[model] = row
        _save_results(res)  # incremental: survive interruption
        print(f"[{model}] {variant}: AP {out['ap']:.4f} "
              f"AP50 {out['ap50']:.4f} AR {out['ar']:.4f} "
              f"({out['eval_seconds']}s)", flush=True)


def print_table() -> None:
    res = _load_results()
    cols = ("base", "fidelity", "fidelity_tta", "fidelity_tta_ms")
    header = "| model | AP base | AP fidelity | AP +flip-TTA | AP +multiscale |"
    if any("fidelity_int8" in row for row in res.values()):
        cols = cols + ("fidelity_int8",)
        header = header + " AP int8@fidelity |"
    print(header)
    print("|---|" + "---|" * len(cols))
    for model in MODELS:
        row = res.get(model)
        if not row:
            continue
        cells = []
        for c in cols:
            cells.append(f"{row[c]['ap']:.3f}" if c in row else "—")
        print(f"| {model} | " + " | ".join(cells) + " |")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=MODELS)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="also evaluate the int8 engine at fidelity settings (quantization AP cost)")
    args = ap.parse_args()

    if args.table:
        print_table()
        return

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.makedirs(BANK_DIR, exist_ok=True)

    models = MODELS if args.all else ((args.model,) if args.model else ())
    if not models:
        raise SystemExit("pass --model NAME, --all, or --table")
    for m in models:
        run_model(m, args.steps, args.lr, args.force, int8=args.int8)
    print_table()


if __name__ == "__main__":
    main()
