"""Split-profile the train step: where do the milliseconds go?

Times (fori-loop slope methodology, scripts/_prof.py :: timed):
  1. targets-only       (uint8 normalize + GT heatmap/PAF synthesis)
  2. forward+loss       (no gradient)
  3. full train step    (forward + backward + optimizer update)
so backward+opt cost = (3) - (2), and (1) shows whether on-device GT
synthesis is overlapped/cheap or worth attention.

    python scripts/profile_train_split.py [--model mobilenet_thin]
        [--batch 8] [--hin 368] [--win 656] [--remat]
"""
from __future__ import annotations

import argparse
import dataclasses
import json

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from openpose_plus_tpu import train as T
from openpose_plus_tpu.config import default_config
from openpose_plus_tpu.data.targets import make_targets_batch
from openpose_plus_tpu.engine import preprocess_images
from openpose_plus_tpu.models import get_model


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mobilenet_thin")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hin", type=int, default=368)
    ap.add_argument("--win", type=int, default=656)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    cfg = default_config(args.model)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hin=args.hin, win=args.win,
                                  remat_stages=args.remat),
        train=dataclasses.replace(cfg.train, batch_size=args.batch))

    state = T.create_train_state(cfg, jax.random.PRNGKey(0))
    # measure the SAME lowering the full train step runs (train_lowering():
    # vgg19 trains with the plain stem while serving keeps s2d)
    train_model_cfg = cfg.model.train_lowering()
    model = get_model(train_model_cfg)
    tstep = T.make_train_step_on_batch(cfg)

    rng = np.random.default_rng(0)
    max_people = 8
    batch = {
        "images": jnp.asarray(rng.integers(
            0, 255, train_model_cfg.input_shape(args.batch),
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
    def targets_only(batch, carry):
        x = preprocess_images(batch["images"]) + carry * 1e-12
        gt_conf, gt_paf = make_targets_batch(
            batch["keypoints"] + carry * 1e-12, cfg.model, cfg.data)
        return (jnp.sum(x[..., 0]) * 1e-9 + jnp.sum(gt_conf)
                + jnp.sum(gt_paf))

    @jax.jit
    def fwd_loss(params, batch, carry):
        x = preprocess_images(batch["images"]) + carry * 1e-12
        # keypoints must also be carry-perturbed (ADVICE.md r2): with a
        # loop-invariant keypoints input XLA hoists GT synthesis out of
        # the fori_loop, under-measuring fwd_loss and over-attributing
        # the synth cost to bwd_plus_opt = full_step - fwd_loss.
        gt_conf, gt_paf = make_targets_batch(
            batch["keypoints"] + carry * 1e-12, cfg.model, cfg.data)
        out = model.apply(params, x)
        loss, _ = T.pose_loss(out, gt_conf, gt_paf, batch["mask"])
        return loss

    # The full step must thread STATE through the loop — with a fixed
    # state0, XLA hoists the loop-invariant forward+backward out of the
    # fori_loop entirely and "full_step" measures one masked-L2 reduction
    # (observed: 0.16 ms vs the true 14.6 ms). Same loop as
    # bench_train.py.
    @jax.jit
    def full_loop(n, state, batch, carry):
        def body(_, sc):
            st, c = sc
            b = dict(batch)
            b["mask"] = batch["mask"] + c * 1e-12
            st, metrics = tstep(st, b)
            return (st, metrics["loss"])
        return jax.lax.fori_loop(0, n, body, (state, carry))[1]

    from bench import fori_slope_seconds

    t = {}
    t["targets_only"] = _prof.timed(targets_only, batch)
    t["fwd_loss"] = _prof.timed(fwd_loss, state.params, batch)
    t["full_step"] = fori_slope_seconds(
        lambda n, c: full_loop(n, state, batch, c), jnp.float32(0.0))
    t["bwd_plus_opt"] = t["full_step"] - t["fwd_loss"]
    print(json.dumps({k: round(v * 1e3, 3) for k, v in t.items()},
                     indent=2))
    print(f"imgs/s full step: {args.batch / t['full_step']:.1f}")


if __name__ == "__main__":
    main()
