"""Where does the int8 VGG19 speedup go? (VERDICT r2 weak #3)

VGG19 int8 delivers ~1.3x over bf16 where the MXU int8/bf16 peak ratio
says ~2x is available. The FLOPs live in the 7x7 128-ch stage convs
(~48 GFLOP each at bs=8 46x82), so this probe times exactly that shape:

  raw        conv only, bf16 vs int8 (is the PRIMITIVE 2x?)
  epilogue   int8 conv + the engine's quantize_act/rescale pattern
             (bf16 -> int8 -> conv -> f32 rescale -> bf16), per conv
  resident   int8-RESIDENT chain: each conv's epilogue emits the NEXT
             conv's int8 input directly (requant folded, no bf16
             inter-conv tensors)

All timings are in-jit fori-loop slopes (bench.fori_slope_seconds).

    python scripts/profile_int8_vgg.py [--chain 5] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _prof  # noqa: E402

_prof.setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import fori_slope_seconds  # noqa: E402

H, W, C = 46, 82, 128
K = 7
_DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, ptype=None):
    kw = {"preferred_element_type": ptype} if ptype else {}
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=_DN, **kw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chain", type=int, default=5,
                    help="convs per chain (the stage head depth)")
    args = ap.parse_args()
    B, N = args.batch, args.chain

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
    ws = [jnp.asarray(rng.normal(0, 0.05, (K, K, C, C)).astype(np.float32))
          for _ in range(N)]
    flops = 2 * K * K * C * C * H * W * B * N

    results = {}

    def measure(name, loop_fn, carry0):
        dt = fori_slope_seconds(loop_fn, carry0, target_seconds=0.3)
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
        }
        print(f"{name:22s} {dt * 1e3:8.3f} ms  "
              f"{flops / dt / 1e12:7.1f} TFLOP/s", flush=True)

    # --- raw bf16 chain -------------------------------------------------
    wb = [w.astype(jnp.bfloat16) for w in ws]
    xb = x0.astype(jnp.bfloat16)

    @jax.jit
    def loop_bf16(n, c):
        def body(_, c):
            y = xb + c.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            for w in wb:
                y = jax.nn.relu(conv(y, w))
            return jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, c)

    measure("bf16_chain", lambda n, c: loop_bf16(n, c), jnp.float32(0))

    # --- raw int8 chain (no quant epilogues: lower bound) ---------------
    wq = [jnp.asarray(rng.integers(-127, 127, (K, K, C, C)),
                      jnp.int8) for _ in range(N)]
    xq = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)

    @jax.jit
    def loop_int8_raw(n, c):
        def body(_, c):
            y = xq + c.astype(jnp.int8)  # chain dependence
            for w in wq:
                acc = conv(y, w, jnp.int32)
                # minimal epilogue: shift back into int8 range
                y = (acc >> 12).astype(jnp.int8)
            return jnp.sum(acc)
        return jax.lax.fori_loop(0, n, body, c)

    measure("int8_raw", lambda n, c: loop_int8_raw(n, c), jnp.int32(0))

    # --- engine's current pattern: bf16 in/out per conv -----------------
    from openpose_plus_tpu.models.common import quantize_act, quantize_weight

    qws = [quantize_weight(w) for w in ws]
    s_act = jnp.float32(4.0)

    @jax.jit
    def loop_epilogue(n, c):
        def body(_, c):
            y = xb + c.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
            for qw, wmax in qws:
                acc = conv(quantize_act(y, s_act), qw, jnp.int32)
                rescale = s_act / (127.0 * 127.0) * wmax
                y = jax.nn.relu(
                    (acc.astype(jnp.float32) * rescale).astype(jnp.bfloat16))
            return jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, c)

    measure("int8_bf16_roundtrip", lambda n, c: loop_epilogue(n, c),
            jnp.float32(0))

    # --- int8-resident chain: requant folded into each epilogue ---------
    @jax.jit
    def loop_resident(n, c):
        def body(_, c):
            q = quantize_act(xb + c.astype(jnp.bfloat16) * jnp.bfloat16(1e-8),
                             s_act)
            for qw, wmax in qws:
                acc = conv(q, qw, jnp.int32)
                # fold (dequant -> relu -> requant at next scale) into one
                # epilogue on the int32 accumulator: relu commutes with
                # the positive rescale, so clip+round directly
                rescale = s_act / (127.0 * 127.0) * wmax / s_act * 127.0
                q = jnp.round(jnp.clip(
                    jax.nn.relu(acc.astype(jnp.float32)) * rescale,
                    0, 127.0)).astype(jnp.int8)
            return jnp.sum(acc)
        return jax.lax.fori_loop(0, n, body, c)

    measure("int8_resident", lambda n, c: loop_resident(n, c),
            jnp.int32(0))

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "bench_int8_probe.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
