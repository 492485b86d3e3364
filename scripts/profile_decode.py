"""Micro-profile the decode pipeline stage by stage on the real chip.

Stages (per decode_maps): upsample+smooth -> find_peaks -> score_candidates
-> greedy_assign -> assemble (Pallas merge). Chained-dependence timing.
"""
from __future__ import annotations

import functools
import os

import _prof

_prof.setup_cache()

import jax

import jax.numpy as jnp
import numpy as np

from openpose_plus_tpu.config import default_config
from openpose_plus_tpu.postproc import decode, nms, paf, group

HIN, WIN, BATCH = 368, 656, 8
ITERS = 20


timed = _prof.timed


def main():
    cfg = default_config().postproc
    hout, wout = HIN // 8, WIN // 8
    rng = np.random.default_rng(0)
    conf = jnp.asarray(rng.random((BATCH, hout, wout, 19), np.float32) * 0.3)
    pafm = jnp.asarray(rng.random((BATCH, hout, wout, 38), np.float32) - 0.5)

    vp = jax.vmap(functools.partial(decode.preprocess_single, cfg=cfg))

    @jax.jit
    def s_pre(conf, pafm, carry):
        sm, pu = vp(conf + carry * 1e-12, pafm)
        return jnp.sum(sm) + jnp.sum(pu) * 1e-6

    sm0, pu0 = jax.jit(vp)(conf, pafm)

    vfind = jax.vmap(functools.partial(
        nms.find_peaks, threshold=cfg.peak_threshold, max_peaks=cfg.max_peaks))

    @jax.jit
    def s_peaks(sm, carry):
        pk = vfind(sm + carry * 1e-12)
        return jnp.sum(pk.score)

    peaks0 = jax.jit(vfind)(sm0)

    vscore = jax.vmap(functools.partial(
        paf.score_candidates, n_samples=cfg.paf_n_samples,
        sample_threshold=cfg.paf_sample_threshold,
        inlier_ratio=cfg.paf_inlier_ratio))

    @jax.jit
    def s_score(pu, peaks, carry):
        sc = vscore(pu + carry * 1e-12, peaks)
        return jnp.sum(jnp.where(jnp.isfinite(sc), sc, 0.0))

    cand0 = jax.jit(vscore)(pu0, peaks0)

    vassign = jax.vmap(functools.partial(paf.greedy_assign,
                                         max_peaks=cfg.max_peaks))

    @jax.jit
    def s_assign(cand, carry):
        cn = vassign(cand + carry * 1e-12)
        return jnp.sum(cn.score)

    conns0 = jax.jit(vassign)(cand0)

    from openpose_plus_tpu.ops.pallas.merge import assemble_pallas
    vassemble = jax.vmap(functools.partial(
        assemble_pallas, max_peaks=cfg.max_peaks, max_humans=cfg.max_humans))

    @jax.jit
    def s_assemble(conns, pscore, carry):
        import dataclasses as dc
        cn = dc.replace(conns, score=conns.score + carry * 1e-12)
        sub = vassemble(cn, pscore)
        return jnp.sum(sub.score)

    t = {}
    t["preprocess(up+smooth)"] = timed(s_pre, conf, pafm)
    t["find_peaks"] = timed(s_peaks, sm0)
    t["score_candidates"] = timed(s_score, pu0, peaks0)
    t["greedy_assign"] = timed(s_assign, cand0)
    t["assemble(pallas)"] = timed(s_assemble, conns0, peaks0.score)
    total = sum(t.values())
    for k, v in t.items():
        print(f"{k:24s}: {v*1e3:8.3f} ms  ({100*v/total:5.1f}%)")
    print(f"{'sum':24s}: {total*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
