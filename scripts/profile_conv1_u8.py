"""Conv1 variants from the ENGINE's real input: uint8 (8,368,656,3).

  cur       — today's path: normalize to float, k3 s2 conv
  u8-s2d    — s2d the uint8 bytes on device, normalize folded into the
              rearranged k2 kernel's bias, k2 s1 conv
  u8-s2d-in — input arrives as s2d'd uint8 (8,184,328,12): the candidate
              new Engine input layout (host loader emits this — same
              bytes, permuted during letterbox)
"""
from __future__ import annotations

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

timed = _prof.timed

B, H, W, CIN, COUT = 8, 368, 656, 3, 24
DN = ("NHWC", "HWIO", "NHWC")


def s2d_kernel(w):
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
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def main():
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (B, H, W, CIN)), jnp.uint8))
    img_q = jax.device_put(s2d(img))
    w = rng.standard_normal((3, 3, CIN, COUT)).astype(np.float32) * 0.1
    wb = jnp.asarray(w, jnp.bfloat16)
    wq = s2d_kernel(w).astype(jnp.bfloat16)

    def norm(x):
        # normalize AFTER s2d so SAME's zero padding still means
        # "normalized zero" (gray), exactly as in the current path
        return (x.astype(jnp.float32) / 255.0 - 0.5).astype(jnp.bfloat16)

    def cur(img):
        return jax.lax.conv_general_dilated(
            norm(img), wb, (2, 2), "SAME", dimension_numbers=DN)

    def u8_s2d(img):
        return jax.lax.conv_general_dilated(
            norm(s2d(img)), wq, (1, 1), [(0, 1), (0, 1)],
            dimension_numbers=DN)

    def u8_s2d_in(img_q):
        return jax.lax.conv_general_dilated(
            norm(img_q), wq, (1, 1), [(0, 1), (0, 1)],
            dimension_numbers=DN)

    ref = np.asarray(jax.jit(cur)(img), np.float32)
    for name, fn, arg in [("u8-s2d", u8_s2d, img),
                          ("u8-s2d-in", u8_s2d_in, img_q)]:
        got = np.asarray(jax.jit(fn)(arg), np.float32)
        err = np.max(np.abs(got - ref))
        print(f"{name} max err vs cur: {err:.4f}")
        assert err < 0.25, (name, err)

    for name, fn, arg in [("cur", cur, img), ("u8-s2d", u8_s2d, img),
                          ("u8-s2d-in", u8_s2d_in, img_q)]:
        @jax.jit
        def step(a, carry, fn=fn):
            # min(carry,0)==0 at runtime but is not constant-foldable,
            # so the iteration chain stays data-dependent.
            y = fn(a + jnp.minimum(carry, 0.0).astype(jnp.uint8))
            return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))
        t = timed(step, arg)
        print(f"{name:9s}: {t*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
