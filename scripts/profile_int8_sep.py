"""Microbenchmark: separable-conv block variants at MobileNet-thin shapes.

Variants per (cin, cout, h, w):
  bf16      — DW bf16 + PW bf16 (the current default path)
  int8-cur  — the shipped int8 mode: DW bf16 -> quantize -> PW int8 (MXU)
  int8-res  — int8-RESIDENT hop: quantize fused into the DW epilogue is
              the same HLO as int8-cur; additionally the block's INPUT is
              already int8 (producer wrote 1B) and its OUTPUT is quantized
              (consumer reads 1B) — the steady-state inner-chain cost.

If int8-res wins at the wide shapes (192..537 ch @46x82) the win is real
end-to-end, because those blocks are ~70% of forward traffic.
"""
from __future__ import annotations

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

timed = _prof.timed

B = 8
DN = ("NHWC", "HWIO", "NHWC")


def variants(cin, cout, h, w):
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, h, w, cin)), jnp.bfloat16))
    x_q = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (B, h, w, cin)), jnp.int8))
    dwk = jnp.asarray(rng.standard_normal((3, 3, 1, cin)) * 0.1, jnp.bfloat16)
    pwk = jnp.asarray(rng.standard_normal((1, 1, cin, cout)) * 0.1,
                      jnp.bfloat16)
    pwk_q = jnp.asarray(rng.integers(-127, 128, (1, 1, cin, cout)), jnp.int8)
    s_in = jnp.float32(0.05)
    s_dw = jnp.float32(0.04)
    s_out = jnp.float32(0.03)

    def dw(x):
        y = jax.lax.conv_general_dilated(
            x, dwk, (1, 1), "SAME", dimension_numbers=DN,
            feature_group_count=cin)
        return jnp.maximum(y, 0)

    def quant(y, s):
        q = jnp.round(jnp.clip(y.astype(jnp.float32) / s, -1, 1) * 127.0)
        return q.astype(jnp.int8)

    @jax.jit
    def f_bf16(x, carry):
        y = dw(x + carry.astype(x.dtype) * 1e-12)
        y = jax.lax.conv_general_dilated(y, pwk, (1, 1), "SAME",
                                         dimension_numbers=DN)
        return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))

    @jax.jit
    def f_int8_cur(x, carry):
        y = dw(x + carry.astype(x.dtype) * 1e-12)
        acc = jax.lax.conv_general_dilated(
            quant(y, s_dw), pwk_q, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * 1e-4, 0).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def f_int8_res(x_q, carry):
        # input int8 -> dequant (fused into ... a copy) -> DW bf16 ->
        # quant epilogue -> PW int8 -> quant epilogue -> int8 out
        xi = x_q.astype(jnp.int32) + carry.astype(jnp.int32) * 0
        xb = (xi.astype(jnp.bfloat16) * s_in.astype(jnp.bfloat16))
        y = dw(xb)
        acc = jax.lax.conv_general_dilated(
            quant(y, s_dw), pwk_q, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        out = jnp.maximum(acc.astype(jnp.float32) * 1e-4, 0)
        out_q = quant(out, s_out)
        return jnp.sum(out_q.astype(jnp.float32))

    ts = {}
    ts["bf16"] = timed(f_bf16, x)
    ts["int8-cur"] = timed(f_int8_cur, x)
    ts["int8-res"] = timed(f_int8_res, x_q)
    line = f"sep {cin:4d}->{cout:4d} @{h}x{w}: " + "  ".join(
        f"{k} {v*1e3:6.3f} ms" for k, v in ts.items())
    rel = ts["int8-res"] / ts["bf16"]
    print(line + f"   (res/bf16 = {rel:4.2f})", flush=True)


def main():
    variants(192, 192, 46, 82)    # dw5
    variants(384, 384, 46, 82)    # dw7-9
    variants(537, 128, 46, 82)    # refine stage first conv
    variants(128, 128, 46, 82)    # refine stage inner conv
    variants(96, 96, 92, 164)     # dw3 (stride-4 stage)


if __name__ == "__main__":
    main()
