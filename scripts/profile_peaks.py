"""Micro-profile find_peaks internals + candidate one-hot sampling scheme."""
from __future__ import annotations

import os

import _prof

_prof.setup_cache()

import jax

import jax.numpy as jnp
import numpy as np

from openpose_plus_tpu import skeleton

HIN, WIN, BATCH = 368, 656, 8
H, W = HIN // 8 * 2, WIN // 8 * 2   # upsampled by 2
K = 16
ITERS = 20


timed = _prof.timed


def main():
    rng = np.random.default_rng(0)
    sm = jnp.asarray(rng.random((BATCH, H, W, 19), np.float32) * 0.3)
    thr = 0.05

    @jax.jit
    def s_pool(sm, carry):
        parts = sm[..., :18] + carry * 1e-12
        pooled = jax.lax.reduce_window(
            parts, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        is_peak = (parts >= pooled) & (parts > thr)
        return jnp.sum(jnp.where(is_peak, parts, 0.0))

    @jax.jit
    def s_topk(sm, carry):
        parts = sm[..., :18] + carry * 1e-12
        flat = parts.reshape(BATCH, H * W, 18).transpose(0, 2, 1)
        score, idx = jax.lax.top_k(flat, K)
        return jnp.sum(score) + jnp.sum(idx) * 1e-9

    @jax.jit
    def s_topk2(sm, carry):
        """Hierarchical exact top-k: blockwise top-K then merge."""
        parts = sm[..., :18] + carry * 1e-12
        flat = parts.reshape(BATCH, H * W, 18).transpose(0, 2, 1)
        hw = H * W
        nb = 128
        nblk = (hw + nb - 1) // nb
        pad = nblk * nb - hw
        flat_p = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)),
                         constant_values=-jnp.inf)
        blocks = flat_p.reshape(BATCH, 18, nblk, nb)
        s1, i1 = jax.lax.top_k(blocks, K)          # (B,18,nblk,K)
        base = (jnp.arange(nblk) * nb)[None, None, :, None]
        gidx = (i1 + base).reshape(BATCH, 18, nblk * K)
        s2, i2 = jax.lax.top_k(s1.reshape(BATCH, 18, nblk * K), K)
        idx = jnp.take_along_axis(gidx, i2, axis=-1)
        return jnp.sum(s2) + jnp.sum(idx) * 1e-9

    @jax.jit
    def s_gather5(sm, carry):
        """Subpixel-refine-style gathers: 5 batched gathers of (18,K)."""
        parts = sm[..., :18] + carry * 1e-12
        m_flat = parts.reshape(BATCH, H * W, 18).transpose(0, 2, 1)
        idx = jnp.asarray(
            rng.integers(0, H * W, (BATCH, 18, K), np.int32))
        tot = 0.0
        for d in (0, 1, -1, W, -W):
            j = jnp.clip(idx + d, 0, H * W - 1)
            tot = tot + jnp.sum(jnp.take_along_axis(m_flat, j, axis=-1))
        return tot

    # one-hot MXU sampling scheme for score_candidates
    pafm = jnp.asarray(rng.random((BATCH, H, W, 38), np.float32) - 0.5)
    L, S = 19, 10
    sy = jnp.asarray(rng.integers(0, H, (BATCH, L, S, K, K), np.int32))
    sx = jnp.asarray(rng.integers(0, W, (BATCH, L, S, K, K), np.int32))

    @jax.jit
    def s_onehot(pafm, sy, sx, carry):
        paf_r = pafm.reshape(BATCH, H, W, L, 2) + carry * 1e-12
        n = S * K * K
        syf = sy.reshape(BATCH, L, n)
        sxf = sx.reshape(BATCH, L, n)
        oy = (syf[..., None] == jnp.arange(H)).astype(jnp.float32)  # (B,L,n,H)
        ox = (sxf[..., None] == jnp.arange(W)).astype(jnp.float32)  # (B,L,n,W)
        # T = einsum over H: (B,L,n,H) x (B,H,W,L,2) -> (B,L,n,W,2)
        t = jnp.einsum("blnh,bhwlc->blnwc", oy, paf_r,
                       precision=jax.lax.Precision.HIGHEST)
        v = jnp.einsum("blnw,blnwc->blnc", ox, t,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(v)

    @jax.jit
    def s_gather_ref(pafm, sy, sx, carry):
        """Current gather scheme for comparison."""
        paf_flat = (pafm + carry * 1e-12).reshape(BATCH, H * W, 38)
        chans = jnp.asarray(skeleton.paf_channels_array())
        flat_idx = sy * W + sx

        def per_img(pf, fi):
            px = jax.vmap(lambda idx, c: pf[:, c][idx])(fi, chans[:, 0])
            py = jax.vmap(lambda idx, c: pf[:, c][idx])(fi, chans[:, 1])
            return jnp.sum(px) + jnp.sum(py)

        return jnp.sum(jax.vmap(per_img)(paf_flat, flat_idx))

    print(f"pool+mask      : {timed(s_pool, sm)*1e3:8.3f} ms")
    print(f"top_k full     : {timed(s_topk, sm)*1e3:8.3f} ms")
    print(f"top_k 2-stage  : {timed(s_topk2, sm)*1e3:8.3f} ms")
    print(f"5x batched gthr: {timed(s_gather5, sm)*1e3:8.3f} ms")
    print(f"paf gather ref : {timed(s_gather_ref, pafm, sy, sx)*1e3:8.3f} ms")
    print(f"paf one-hot mxu: {timed(s_onehot, pafm, sy, sx)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
