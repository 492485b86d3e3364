"""Compare exact top-k strategies for peak extraction on TPU."""
from __future__ import annotations

import os

import _prof

_prof.setup_cache()

import jax

import jax.numpy as jnp
import numpy as np

HIN, WIN, BATCH = 368, 656, 8
H, W = HIN // 8 * 2, WIN // 8 * 2
K = 16
ITERS = 20
HW = H * W


timed = _prof.timed


def main():
    rng = np.random.default_rng(0)
    sm = jnp.asarray(rng.random((BATCH, 18, HW), np.float32) * 0.3)

    @jax.jit
    def s_topk(flat, carry):
        score, idx = jax.lax.top_k(flat + carry * 1e-12, K)
        return jnp.sum(score) + jnp.sum(idx) * 1e-9

    @jax.jit
    def s_iter(flat, carry):
        flat = flat + carry * 1e-12
        iota = jnp.arange(HW)[None, None, :]

        def body(t, c):
            rem, scores, idxs = c
            j = jnp.argmax(rem, axis=-1)                    # (B,18)
            s = jnp.max(rem, axis=-1)
            scores = scores.at[:, :, t].set(s)
            idxs = idxs.at[:, :, t].set(j)
            rem = jnp.where(iota == j[..., None], -jnp.inf, rem)
            return rem, scores, idxs

        init = (flat, jnp.zeros((BATCH, 18, K)), jnp.zeros((BATCH, 18, K),
                                                           jnp.int32))
        _, scores, idxs = jax.lax.fori_loop(0, K, body, init)
        return jnp.sum(scores) + jnp.sum(idxs) * 1e-9

    @jax.jit
    def s_approx(flat, carry):
        score, idx = jax.lax.approx_max_k(
            flat + carry * 1e-12, K, recall_target=0.99,
            aggregate_to_topk=True)
        return jnp.sum(score) + jnp.sum(idx) * 1e-9

    @jax.jit
    def s_blockmax_then_topk(flat, carry):
        """Exact when <=K peaks share a 128-block... NOT exact in general;
        measured only as a speed reference."""
        flat = flat + carry * 1e-12
        b = flat.reshape(BATCH, 18, HW // 8, 8)
        m = jnp.max(b, axis=-1)
        score, bidx = jax.lax.top_k(m, K)
        return jnp.sum(score) + jnp.sum(bidx) * 1e-9

    print(f"lax.top_k     : {timed(s_topk, sm)*1e3:8.3f} ms")
    print(f"iter argmax   : {timed(s_iter, sm)*1e3:8.3f} ms")
    print(f"approx_max_k  : {timed(s_approx, sm)*1e3:8.3f} ms")
    print(f"blockmax ref  : {timed(s_blockmax_then_topk, sm)*1e3:8.3f} ms")

    # correctness of iter-argmax vs top_k incl. tie semantics
    x = np.zeros((1, 18, HW), np.float32)
    x[0, :, 100] = 0.2
    x[0, :, 50] = 0.2
    x[0, :, 4000] = 0.3
    x = jnp.asarray(x + rng.random((1, 18, HW)) * 0.0)
    s_ref, i_ref = jax.jit(lambda f: jax.lax.top_k(f, K))(x)
    def it(flat):
        iota = jnp.arange(HW)[None, None, :]
        def body(t, c):
            rem, scores, idxs = c
            j = jnp.argmax(rem, axis=-1)
            s = jnp.max(rem, axis=-1)
            scores = scores.at[:, :, t].set(s)
            idxs = idxs.at[:, :, t].set(j)
            rem = jnp.where(iota == j[..., None], -jnp.inf, rem)
            return rem, scores, idxs
        init = (flat, jnp.zeros((1, 18, K)), jnp.zeros((1, 18, K), jnp.int32))
        _, s, i = jax.lax.fori_loop(0, K, body, init)
        return s, i
    s_it, i_it = jax.jit(it)(x)
    print("tie parity (scores):", bool(jnp.all(s_ref == s_it)))
    print("tie parity (idx)   :", bool(jnp.all(i_ref == i_it)))


if __name__ == "__main__":
    main()
