"""Fused depthwise-separable conv Pallas kernel (DW 3x3 + ReLU + PW 1x1 + ReLU).

The MobileNet-style separable convs that dominate the model zoo are HBM
bandwidth-bound on TPU: XLA lowers DW and PW as two convolutions with the
depthwise intermediate round-tripping through HBM; this kernel keeps it in
VMEM — one read of x, one write of y. The TPU-native analogue of the fused
conv blocks TensorRT gave the reference engine (src/uff-runner.cpp [MED;
empty mount — SURVEY.md §2 "TensorRT engine wrapper"]).

STATUS (v5e, 2026-08-18): measured SLOWER than XLA's unfused pair at model
level for every gating choice (forward 4.8ms XLA vs 5.2-6.3ms fused at bs=8
368x656). XLA's pair already runs at ~94% of HBM peak and its depthwise
lowering beats this kernel's 9-tap VPU loop, whose sublane-shifted taps are
relayout-bound in Mosaic. Kept as an opt-in (ModelConfig.fused_inference +
PALLAS_SEPCONV_MAX_C) for hardware where the crossover differs; re-profile
before enabling.

Numerics mirror the XLA path (flax nn.Conv with bfloat16 compute dtype):
inputs/weights in bf16, f32 accumulation, round to bf16 between DW-bias-ReLU
and the PW matmul. Not bit-identical to XLA (different contraction order);
tests pin agreement to bf16 tolerance.

Inference-path only (no custom VJP): the training step keeps the XLA
lowering, which autodiff handles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sepconv_kernel(x_ref, dwk_ref, dwb_ref, pwk_ref, pwb_ref, out_ref):
    """One image per program: x (1, H, W, C) -> out (1, H, W, F)."""
    _, h, w, c = x_ref.shape
    x = x_ref[0]                                   # bf16 (H, W, C)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))      # zero padding (SAME)
    acc = jnp.zeros((h, w, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xp[dy:dy + h, dx:dx + w, :].astype(jnp.float32)
            acc = acc + tap * dwk_ref[dy * 3 + dx, :].astype(jnp.float32)
    dw = jnp.maximum(acc.astype(jnp.bfloat16)
                     + dwb_ref[0, :].astype(jnp.bfloat16), 0)
    f = pwk_ref.shape[1]
    y = jax.lax.dot_general(
        dw.reshape(h * w, c), pwk_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y.astype(jnp.bfloat16)
                    + pwb_ref[0, :].astype(jnp.bfloat16), 0)
    out_ref[0] = y.reshape(h, w, f)


def fused_sepconv(x: jax.Array, dw_kernel: jax.Array, dw_bias: jax.Array,
                  pw_kernel: jax.Array, pw_bias: jax.Array) -> jax.Array:
    """relu(pw(relu(dw3x3(x)))) fused in VMEM.

    x: (B, H, W, C) bf16; dw_kernel: (3, 3, 1, C); dw_bias: (C,);
    pw_kernel: (1, 1, C, F); pw_bias: (F,). Returns (B, H, W, F) bf16.
    Stride 1, SAME padding only — callers keep XLA for anything else.
    """
    b, h, w, c = x.shape
    f = pw_kernel.shape[-1]
    dwk = dw_kernel.reshape(9, c).astype(jnp.bfloat16)
    pwk = pw_kernel.reshape(c, f).astype(jnp.bfloat16)
    dwb = dw_bias.reshape(1, c).astype(jnp.bfloat16)
    pwb = pw_bias.reshape(1, f).astype(jnp.bfloat16)

    flops = b * h * w * (9 * c + 2 * c * f)
    bytes_accessed = (b * h * w * (c + f)) * 2 + dwk.size * 2 + pwk.size * 2
    return pl.pallas_call(
        _sepconv_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
    )(x.astype(jnp.bfloat16), dwk, dwb, pwk, pwb)


def fused_sepconv_fits(h: int, w: int, c: int, f: int,
                       budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Static eligibility check: VMEM fit + profitable channel width.

    The fused kernel wins when its in-VMEM depthwise (9 VPU FMA taps with
    relayout-heavy sublane shifts) costs less than the HBM round trip it
    saves; measured on v5e that holds up to ~256 channels and inverts for
    the very wide stage-1 inputs (~540ch), where XLA's unfused pair is
    already at its traffic optimum. PALLAS_SEPCONV_MAX_C overrides the
    crossover for tuning.
    """
    import os

    max_c = int(os.environ.get("PALLAS_SEPCONV_MAX_C", "256"))
    if max(c, f) > max_c:
        return False
    working = (
        (h + 2) * (w + 2) * c * 2      # padded input copy (bf16)
        + h * w * c * 2                # input block
        + h * w * c * 4                # f32 DW accumulator
        + h * w * c * 2                # DW output (bf16)
        + h * w * f * 4                # PW f32 accumulator
        + h * w * f * 2                # output block
        + 9 * c * 2 + c * f * 2        # weights
    )
    return working <= budget_bytes
