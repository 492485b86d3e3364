"""Prototype: VGG-style conv1 block (k3 s1 convs + 2x2 maxpool) in
space-to-depth space.

plain:   conv(3->C) + conv(C->C) @H x W, maxpool2 -> (H/2, W/2, C)
s2d:     on the (H/2, W/2) block grid with pos-MAJOR channels:
           conv -> dense 3x3, 12 -> 4C   (stride-1 lowering, pad 1)
           conv -> dense 3x3, 4C -> 4C   (4x structurally-zero FLOPs)
           pool -> max over the 4 contiguous position chunks (FREE:
                   no depth-to-space, output is already the plain
                   pooled grid)

The 2x2 maxpool is EXACTLY the channel-chunk max because each block
holds the pool window. Checked vs plain, then timed for the C=32
(vggtiny/hao28) and C=64 (VGG19) stems at bs=8 368x656.
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


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def s1_kernel(w):
    """(3,3,cin,cout) k3-s1 -> (3,3,4cin,4cout) on the block grid,
    pos-major channels both sides."""
    cin, cout = w.shape[2], w.shape[3]
    ind = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for P in range(3):
        for Q in range(3):
            for uy, ux, vy, vx in np.ndindex(2, 2, 2, 2):
                ky = 2 * P + vy - uy - 1
                kx = 2 * Q + vx - ux - 1
                if 0 <= ky < 3 and 0 <= kx < 3:
                    ind[P, Q, vy * 2 + vx, uy * 2 + ux, ky, kx] = 1.0
    k = np.einsum("PQiukl,klcd->PQicud", ind, w)  # (3,3,4,cin,4,cout)
    return k.reshape(3, 3, 4 * cin, 4 * cout)


def run(C):
    rng = np.random.default_rng(0)
    w1 = (rng.standard_normal((3, 3, 3, C)) * 0.2).astype(np.float32)
    b1 = (rng.standard_normal(C) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, C, C)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal(C) * 0.05).astype(np.float32)
    K1, K2 = s1_kernel(w1), s1_kernel(w2)
    img = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)

    def conv(x, k, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=DN)

    def plain(u8, dt):
        x = (u8.astype(jnp.float32) / 255.0 - 0.5).astype(dt)
        x = jnp.maximum(conv(x, w1.astype(dt)) + b1.astype(dt), 0)
        x = jnp.maximum(conv(x, w2.astype(dt)) + b2.astype(dt), 0)
        b, h, w_, c = x.shape
        x = x.reshape(b, h // 2, 2, w_ // 2, 2, c)
        return x.max(axis=(2, 4))

    def fast(q, dt):  # q: s2d uint8 (B, H/2, W/2, 12)
        x = (q.astype(jnp.float32) / 255.0 - 0.5).astype(dt)
        rep = lambda b_: jnp.tile(b_, 4)  # pos-major: bias tiles
        x = jnp.maximum(conv(x, K1.astype(dt), [(1, 1), (1, 1)])
                        + rep(b1).astype(dt), 0)
        x = jnp.maximum(conv(x, K2.astype(dt), [(1, 1), (1, 1)])
                        + rep(b2).astype(dt), 0)
        p = x[..., :C]
        for i in range(1, 4):
            p = jnp.maximum(p, x[..., i * C:(i + 1) * C])
        return p

    q = s2d(jnp.asarray(img))
    ref = np.asarray(jax.jit(lambda a: plain(a, jnp.float32))(
        jnp.asarray(img)))
    got = np.asarray(jax.jit(lambda a: fast(a, jnp.float32))(q))
    err = np.max(np.abs(got - ref)) / max(1e-6, np.max(np.abs(ref)))
    print(f"C={C}: rel err (f32) {err:.2e}")
    assert err < 3e-2

    img_d = jax.device_put(jnp.asarray(img))
    q_d = jax.device_put(q)
    for name, fn, arg in [("plain", plain, img_d), ("s2d", fast, q_d)]:
        @jax.jit
        def step(a, carry, fn=fn):
            y = fn(a + jnp.minimum(carry, 0.0).astype(jnp.uint8),
                   jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32))
        t = timed(step, arg)
        print(f"  C={C} {name:6s}: {t*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    run(32)   # vggtiny / hao28 stem
    run(64)   # vgg19 stem
