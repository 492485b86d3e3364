"""Per-layer microbenchmark of the MobileNet-thin backbone at bs=8 368x656.

Times each conv/sepconv in isolation (chained-dependence methodology) and
prints measured ms vs an HBM-roofline estimate (bf16 in+out traffic at
819 GB/s), to locate the layers leaving the most bandwidth on the table.
"""
from __future__ import annotations

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

timed = _prof.timed

HBM_GBPS = 819.0
B = 8


def sep(cin, cout, h, w, stride=1):
    """One depthwise-separable block (DW 3x3 + PW 1x1, both +ReLU)."""
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, h, w, cin)), jnp.bfloat16))
    dwk = jnp.asarray(rng.standard_normal((3, 3, 1, cin)) * 0.1, jnp.bfloat16)
    pwk = jnp.asarray(rng.standard_normal((1, 1, cin, cout)) * 0.1,
                      jnp.bfloat16)

    @jax.jit
    def step(x, carry):
        y = jax.lax.conv_general_dilated(
            x + carry.astype(x.dtype) * 1e-12, dwk, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cin)
        y = jnp.maximum(y, 0)
        y = jax.lax.conv_general_dilated(
            y, pwk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))

    t = timed(step, x)
    ho, wo = h // stride, w // stride
    traffic = B * 2 * (h * w * cin + ho * wo * cin + ho * wo * cin
                       + ho * wo * cout)  # bf16: x rd, dw wr+rd, y wr
    roof = traffic / (HBM_GBPS * 1e9)
    flops = B * ho * wo * (cin * 9 + cin * cout) * 2
    print(f"sep {cin:4d}->{cout:4d} @{h}x{w} s{stride}: {t*1e3:6.3f} ms  "
          f"roofline {roof*1e3:6.3f} ms ({100*roof/t:5.1f}% of peak)  "
          f"{flops/t/1e12:5.2f} TFLOP/s", flush=True)
    return t


def conv(cin, cout, h, w, k=3, stride=1, note=""):
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, h, w, cin)), jnp.bfloat16))
    kk = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                     jnp.bfloat16)

    @jax.jit
    def step(x, carry):
        y = jax.lax.conv_general_dilated(
            x + carry.astype(x.dtype) * 1e-12, kk, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))

    t = timed(step, x)
    ho, wo = h // stride, w // stride
    traffic = B * 2 * (h * w * cin + ho * wo * cout)
    roof = traffic / (HBM_GBPS * 1e9)
    flops = B * ho * wo * cin * cout * k * k * 2
    print(f"conv{k}x{k} {cin:4d}->{cout:4d} @{h}x{w} s{stride}{note}: "
          f"{t*1e3:6.3f} ms  roofline {roof*1e3:6.3f} ms "
          f"({100*roof/t:5.1f}% of peak)  {flops/t/1e12:5.2f} TFLOP/s",
          flush=True)
    return t


def main():
    total = 0.0
    total += conv(3, 24, 368, 656, stride=2, note=" [conv1]")
    total += sep(24, 48, 184, 328)            # dw1
    total += sep(48, 96, 184, 328, stride=2)  # dw2
    total += sep(96, 96, 92, 164)             # dw3
    total += sep(96, 192, 92, 164, stride=2)  # dw4
    total += sep(192, 192, 46, 82)            # dw5
    total += sep(192, 384, 46, 82)            # dw6
    for _ in range(3):                        # dw7-9
        total += sep(384, 384, 46, 82)
    print(f"backbone sum of isolated layers: {total*1e3:.2f} ms")
    # one refine-stage branch conv for comparison (537->128 sep x1)
    sep(537, 128, 46, 82)
    sep(128, 128, 46, 82)


if __name__ == "__main__":
    main()
