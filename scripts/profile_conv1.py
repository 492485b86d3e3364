"""Microbenchmark: conv1 (3->24, 3x3 s2 @368x656 bs=8) lowering variants.

profile_layers.py showed this single layer runs at ~3.6% of the HBM
roofline (~1.19 ms) — cin=3 wastes 125/128 MXU lanes and the im2col
lowering moves padded tiles. Candidate fixes, all numerically equivalent
reformulations of the SAME conv (weights rearranged at trace time):

  base      — lax.conv 3->24 k3 s2 NHWC (current path)
  s2d       — space-to-depth x2 on device, then k2 s1 conv 12->24 with the
              zero-padded rearranged kernel (MLPerf ResNet stem trick)
  s2d-host  — input arrives already space-to-depth'd (184,328,12): the
              steady cost if the transform moves into the host loader
  slice9    — 9 strided slices concat'd to (184,328,27), then 1x1 conv
  nchw      — same conv with NCHW dimension numbers (spatial in lanes)

Each variant is checked against base to ~1e-2 (bf16) before timing.
"""
from __future__ import annotations

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

timed = _prof.timed

B = 8
H, W, CIN, COUT = 368, 656, 3, 24
DN = ("NHWC", "HWIO", "NHWC")


def s2d_kernel(w):
    """Rearrange (3,3,3,cout) into the (2,2,12,cout) kernel that makes
    k2-s1-on-s2d exactly equal k3-s2 (SAME pads (0,1) on both dims)."""
    wq = np.zeros((2, 2, 4 * CIN, w.shape[-1]), w.dtype)
    for ky in range(3):
        for kx in range(3):
            p, wy = divmod(ky, 2)
            q, wx = divmod(kx, 2)
            wq[p, q, (wy * 2 + wx) * CIN:(wy * 2 + wx + 1) * CIN] = w[ky, kx]
    return jnp.asarray(wq)


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, CIN)), jnp.bfloat16))
    w = rng.standard_normal((3, 3, CIN, COUT)).astype(np.float32) * 0.1
    wb = jnp.asarray(w, jnp.bfloat16)
    wq = s2d_kernel(w).astype(jnp.bfloat16)
    w9 = jnp.asarray(  # tap order (ky,kx) major, c minor — matches slices
        np.concatenate([w[ky, kx] for ky in range(3) for kx in range(3)],
                       axis=0)[None, None], jnp.bfloat16)
    x_pre = jax.device_put(s2d(x))

    def base(x):
        return jax.lax.conv_general_dilated(
            x, wb, (2, 2), "SAME", dimension_numbers=DN)

    def from_s2d(xq):
        return jax.lax.conv_general_dilated(
            xq, wq, (1, 1), [(0, 1), (0, 1)], dimension_numbers=DN)

    def v_s2d(x):
        return from_s2d(s2d(x))

    def v_slice9(x):
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        cols = [xp[:, ky:ky + H:2, kx:kx + W:2, :]
                for ky in range(3) for kx in range(3)]
        return jax.lax.conv_general_dilated(
            jnp.concatenate(cols, axis=-1), w9, (1, 1), "VALID",
            dimension_numbers=DN)

    def v_nchw(x):
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 3, 1, 2), wb.transpose(3, 2, 0, 1), (2, 2),
            "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.transpose(0, 2, 3, 1)

    ref = np.asarray(jax.jit(base)(x), np.float32)
    for name, fn, arg in [("s2d", v_s2d, x), ("s2d-host", from_s2d, x_pre),
                          ("slice9", v_slice9, x), ("nchw", v_nchw, x)]:
        got = np.asarray(jax.jit(fn)(arg), np.float32)
        err = np.max(np.abs(got - ref))
        assert err < 1e-1, (name, err)

    for name, fn, arg in [("base", base, x), ("s2d", v_s2d, x),
                          ("s2d-host", from_s2d, x_pre),
                          ("slice9", v_slice9, x), ("nchw", v_nchw, x)]:
        @jax.jit
        def step(a, carry, fn=fn):
            y = fn(a + carry.astype(a.dtype) * 1e-12)
            return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))
        t = timed(step, arg)
        print(f"{name:9s}: {t*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
