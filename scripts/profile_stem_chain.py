"""Prototype: run conv1+dw1+dw2 entirely in space-to-depth space.

Today (after the s2d stem): conv1 consumes s2d(input) but emits the plain
(184,328,24) grid, and dw1/dw2 run there at 18-23% of the HBM roofline
(24-48 channels waste MXU/VPU lanes and tile padding inflates traffic).

The deep-s2d lowering keeps the whole stride-2 region on the (92,164)
block grid — input arrives as s2d^2 uint8 (92,164,48):

  conv1  k3 s2  3->24          => dense 2x2  48->96   (pad (0,1))
  dw1-dw k3 s1 depthwise 24    => dense 3x3  96->96   (pad 1; block-sparse)
  dw1-pw 1x1   24->48          => dense 1x1  96->192  (block-diagonal)
  dw2-dw k3 s2 depthwise 48    => dense 2x2 192->48   (pad (0,1)) -> PLAIN grid
  dw2-pw 1x1   48->96          => unchanged (92,164) 48->96

Every kernel is rearranged from the ORIGINAL params at trace time
(checkpoint-identical); zero-filled slots waste MXU FLOPs, which are free
here — the stage is bandwidth-bound. Output after dw2 lands exactly on
today's (92,164,96) grid, so dw3+ is untouched.

This script checks numerical equivalence against the plain lowering, then
times both chains at bs=8 368x656 bf16.
"""
from __future__ import annotations

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

timed = _prof.timed

B, H, W = 8, 368, 656
DN = ("NHWC", "HWIO", "NHWC")
C1, C2, C3 = 24, 48, 96  # conv1 out, dw1 out, dw2 out


def s2d_np(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def conv(x, k, stride=1, pad="SAME", groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad, dimension_numbers=DN,
        feature_group_count=groups)


def build_kernels(w1, dwk1, pwk1, dwk2):
    """Rearranged deep-s2d kernels (numpy, trace-time)."""
    # K1: (2,2,48,96)  in ch=(vy*2+vx)*12+(wy*2+wx)*3+c, out ch=o*4+uy*2+ux
    K1 = np.zeros((2, 2, 48, 4 * C1), np.float32)
    for P in range(2):
        for Q in range(2):
            for uy in range(2):
                for ux in range(2):
                    for vy in range(2):
                        for vx in range(2):
                            for wy in range(2):
                                for wx in range(2):
                                    ky = 4 * P + 2 * vy + wy - 2 * uy
                                    kx = 4 * Q + 2 * vx + wx - 2 * ux
                                    if not (0 <= ky < 3 and 0 <= kx < 3):
                                        continue
                                    ic = (vy * 2 + vx) * 12 + (wy * 2 + wx) * 3
                                    K1[P, Q, ic:ic + 3,
                                       uy * 2 + ux::4] = w1[ky, kx]
    # Kd1: (3,3,96,96) in/out ch = m*4+pos (block-sparse depthwise)
    Kd1 = np.zeros((3, 3, 4 * C1, 4 * C1), np.float32)
    for P in range(3):
        for Q in range(3):
            for uy in range(2):
                for ux in range(2):
                    for vy in range(2):
                        for vx in range(2):
                            ky = 2 * P + vy - uy - 1
                            kx = 2 * Q + vx - ux - 1
                            if not (0 <= ky < 3 and 0 <= kx < 3):
                                continue
                            ip, op = vy * 2 + vx, uy * 2 + ux
                            for m in range(C1):
                                Kd1[P, Q, m * 4 + ip,
                                    m * 4 + op] = dwk1[ky, kx, 0, m]
    # Kp1: (1,1,96,192) block-diagonal pointwise
    Kp1 = np.zeros((1, 1, 4 * C1, 4 * C2), np.float32)
    for p in range(4):
        Kp1[0, 0, p::4, p::4] = pwk1[0, 0]
    # Kd2: (2,2,192,48) — consumes s2d grid, emits plain
    Kd2 = np.zeros((2, 2, 4 * C2, C2), np.float32)
    for p in range(2):
        for q in range(2):
            for vy in range(2):
                for vx in range(2):
                    ky, kx = 2 * p + vy, 2 * q + vx
                    if not (ky < 3 and kx < 3):
                        continue
                    for n in range(C2):
                        Kd2[p, q, n * 4 + vy * 2 + vx,
                            n] = dwk2[ky, kx, 0, n]
    return K1, Kd1, Kp1, Kd2


def main():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    w1 = (rng.standard_normal((3, 3, 3, C1)) * 0.2).astype(np.float32)
    b1 = (rng.standard_normal(C1) * 0.05).astype(np.float32)
    dwk1 = (rng.standard_normal((3, 3, 1, C1)) * 0.2).astype(np.float32)
    dwb1 = (rng.standard_normal(C1) * 0.05).astype(np.float32)
    pwk1 = (rng.standard_normal((1, 1, C1, C2)) * 0.1).astype(np.float32)
    pwb1 = (rng.standard_normal(C2) * 0.05).astype(np.float32)
    dwk2 = (rng.standard_normal((3, 3, 1, C2)) * 0.2).astype(np.float32)
    dwb2 = (rng.standard_normal(C2) * 0.05).astype(np.float32)
    pwk2 = (rng.standard_normal((1, 1, C2, C3)) * 0.1).astype(np.float32)
    pwb2 = (rng.standard_normal(C3) * 0.05).astype(np.float32)
    K1, Kd1, Kp1, Kd2 = build_kernels(w1, dwk1, pwk1, dwk2)

    def plain_chain(x, dt):
        """Reference lowering from the plain image."""
        r = lambda a: jnp.maximum(a, 0)
        x = (x.astype(jnp.float32) / 255.0 - 0.5).astype(dt)
        y = r(conv(x, w1.astype(dt), 2) + b1.astype(dt))
        y = r(conv(y, dwk1.astype(dt), groups=C1) + dwb1.astype(dt))
        y = r(conv(y, pwk1.astype(dt)) + pwb1.astype(dt))
        y = r(conv(y, dwk2.astype(dt), 2, groups=C2) + dwb2.astype(dt))
        y = r(conv(y, pwk2.astype(dt)) + pwb2.astype(dt))
        return y

    def deep_chain(xq, dt):
        """Deep-s2d lowering from the s2d^2 uint8 input."""
        r = lambda a: jnp.maximum(a, 0)
        rep4 = lambda b: np.repeat(b, 4)
        x = (xq.astype(jnp.float32) / 255.0 - 0.5).astype(dt)
        y = r(conv(x, K1.astype(dt), pad=[(0, 1), (0, 1)])
              + rep4(b1).astype(dt))
        y = r(conv(y, Kd1.astype(dt), pad=[(1, 1), (1, 1)])
              + rep4(dwb1).astype(dt))
        y = r(conv(y, Kp1.astype(dt)) + rep4(pwb1).astype(dt))
        y = r(conv(y, Kd2.astype(dt), pad=[(0, 1), (0, 1)])
              + dwb2.astype(dt))
        y = r(conv(y, pwk2.astype(dt)) + pwb2.astype(dt))
        return y

    xq = s2d_np(s2d_np(img))
    ref = np.asarray(jax.jit(
        lambda a: plain_chain(a, jnp.float32))(img))
    got = np.asarray(jax.jit(
        lambda a: deep_chain(a, jnp.float32))(jnp.asarray(xq)))
    err = np.max(np.abs(got - ref)) / max(1e-6, np.max(np.abs(ref)))
    print(f"deep-s2d rel err (f32): {err:.2e}")
    assert err < 3e-2, err  # TPU f32 convs are bf16-ish; exactness on CPU

    x_d = jax.device_put(jnp.asarray(img))
    xq_d = jax.device_put(jnp.asarray(xq))
    for name, fn, arg in [("plain", plain_chain, x_d),
                          ("deep-s2d", deep_chain, xq_d)]:
        @jax.jit
        def step(a, carry, fn=fn):
            y = fn(a + jnp.minimum(carry, 0.0).astype(jnp.uint8),
                   jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32))
        t = timed(step, arg)
        print(f"{name:9s}: {t*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
