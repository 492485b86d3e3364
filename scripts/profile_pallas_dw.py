"""Decisive probe for the stage-branch mega-kernel idea: what does the
9-tap depthwise cost INSIDE a Pallas kernel at head shapes, vs its VPU
floor and vs XLA's lowering?

Three kernels at (8, 46, 82, C):
  dw-only      — pad + 9 shifted FMAs in VMEM (the sepconv kernel's DW)
  copy-only    — same I/O, no compute (isolates kernel+relayout overhead)
  dw+mm        — DW then one MXU matmul (the fused sepconv, C->C)

If dw-only ≈ copy-only + VPU FLOP time, the mega-kernel can win ~1 ms of
head time; if the 9-tap loop itself is several-x that, the idea is dead
(strengthens the recorded negative result with a number).
"""
from __future__ import annotations

import _prof

_prof.setup_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

timed = _prof.timed

B, H, W = 8, 46, 82


def dw_kernel(x_ref, dwk_ref, out_ref):
    _, h, w, c = x_ref.shape
    x = x_ref[0]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h, w, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[dy:dy + h, dx:dx + w, :].astype(jnp.float32)
            acc = acc + tap * dwk_ref[dy * 3 + dx, :].astype(jnp.float32)
    out_ref[0] = jnp.maximum(acc, 0).astype(jnp.bfloat16)


def copy_kernel(x_ref, dwk_ref, out_ref):
    out_ref[0] = x_ref[0] + dwk_ref[0, :].astype(jnp.bfloat16)


def run(c, body):
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, c)), jnp.bfloat16))
    dwk = jnp.asarray(rng.standard_normal((9, c)) * 0.1, jnp.bfloat16)
    call = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c), jnp.bfloat16),
    )

    @jax.jit
    def step(x, carry):
        y = call(x + carry.astype(x.dtype) * 1e-12, dwk)
        return jnp.sum(y.astype(jnp.float32))

    return timed(step, x)


def main():
    for c in (128, 256):
        t_dw = run(c, dw_kernel)
        t_cp = run(c, copy_kernel)
        floor = B * H * W * c * 2 * 2 / 819e9  # bf16 in+out @HBM peak
        print(f"C={c}: dw-in-kernel {t_dw*1e3:6.3f} ms | copy-kernel "
              f"{t_cp*1e3:6.3f} ms | traffic floor {floor*1e3:6.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
