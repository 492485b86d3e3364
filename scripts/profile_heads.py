"""Microbenchmark: MobileNet-thin stage-head fusion candidates.

The head is 6 stages x 2 branches x (3 sepconvs + proj + pred) of small
46x82 convs — per-op dispatch/latency floors dominate. Candidates (same
math, branch weights combined at trace time):

  separate — today's two independent branch chains per stage
  fused    — ONE double-width chain per stage:
               * first sepconv: depthwise with channel multiplier 2
                 (feature_group_count=cin, 2 filters/channel), then a
                 dense 2cin->256 pointwise with zero cross-blocks
               * inner sepconvs: depthwise on 256 (stacked kernels) +
                 block-diagonal dense 256->256 pointwise
               * proj + pred: block-diagonal dense
  fused-g  — same but pointwise as feature_group_count=2 grouped convs

Checks numerical agreement (f32-level tolerances in bf16), then times the
full 6-stage head at bs=8.
"""
from __future__ import annotations

import _prof

_prof.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

timed = _prof.timed

B, H, W = 8, 46, 82
FEAT = 480
MID = 128
DN = ("NHWC", "HWIO", "NHWC")


def conv(x, k, stride=1, pad="SAME", groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad, dimension_numbers=DN,
        feature_group_count=groups)


def relu(x):
    return jnp.maximum(x, 0)


def main():
    rng = np.random.default_rng(0)

    def mk(shape, s=0.1):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    # per-stage, per-branch params: 3 sepconvs (dw+pw), proj 1x1, pred 1x1
    outs = (19, 38)
    stages = []
    for s in range(6):
        cin = FEAT if s == 0 else FEAT + 19 + 38
        proj = 256 if s == 0 else 128
        br = []
        for nout in outs:
            convs = []
            c = cin
            for _ in range(3):
                convs.append((mk((3, 3, 1, c)), mk((1, 1, c, MID))))
                c = MID
            br.append(dict(convs=convs, proj=mk((1, 1, MID, proj)),
                           pred=mk((1, 1, proj, nout))))
        stages.append(br)

    def run_separate(x, dt):
        feat = x.astype(dt)
        conf = paf = None
        for s, br in enumerate(stages):
            inp = feat if s == 0 else jnp.concatenate(
                [feat, conf, paf], axis=-1)
            res = []
            for bp in br:
                y = inp
                for dw, pw in bp["convs"]:
                    y = relu(conv(y, dw.astype(dt), groups=y.shape[-1]))
                    y = relu(conv(y, pw.astype(dt)))
                y = relu(conv(y, bp["proj"].astype(dt)))
                res.append(conv(y, bp["pred"].astype(dt)))
            conf, paf = res
        return conf, paf

    def fuse_stage(br, cin, proj, grouped):
        """Trace-time combined kernels for one stage."""
        a, b = br
        # first sepconv: dw multiplier-2 (channel i -> [2i, 2i+1]),
        # then (2cin -> 2*MID) pointwise with zero cross blocks
        dw0 = np.stack([a["convs"][0][0][..., 0, :],
                        b["convs"][0][0][..., 0, :]],
                       axis=-1).reshape(3, 3, 1, cin * 2)
        pw0 = np.zeros((1, 1, 2 * cin, 2 * MID), np.float32)
        pw0[0, 0, 0::2, :MID] = a["convs"][0][1][0, 0]
        pw0[0, 0, 1::2, MID:] = b["convs"][0][1][0, 0]
        inner = []
        for i in (1, 2):
            dwi = np.concatenate([a["convs"][i][0], b["convs"][i][0]],
                                 axis=-1)
            if grouped:
                pwi = np.concatenate([a["convs"][i][1], b["convs"][i][1]],
                                     axis=-1)  # (1,1,MID,2MID) grouped
            else:
                pwi = np.zeros((1, 1, 2 * MID, 2 * MID), np.float32)
                pwi[0, 0, :MID, :MID] = a["convs"][i][1][0, 0]
                pwi[0, 0, MID:, MID:] = b["convs"][i][1][0, 0]
            inner.append((dwi, pwi))
        if grouped:
            projk = np.concatenate([a["proj"], b["proj"]], axis=-1)
        else:
            projk = np.zeros((1, 1, 2 * MID, 2 * proj), np.float32)
            projk[0, 0, :MID, :proj] = a["proj"][0, 0]
            projk[0, 0, MID:, proj:] = b["proj"][0, 0]
        predk = np.zeros((1, 1, 2 * proj, outs[0] + outs[1]), np.float32)
        predk[0, 0, :proj, :outs[0]] = a["pred"][0, 0]
        predk[0, 0, proj:, outs[0]:] = b["pred"][0, 0]
        return dw0, pw0, inner, projk, predk, proj

    def run_fused(x, dt, grouped):
        feat = x.astype(dt)
        conf = paf = None
        for s, br in enumerate(stages):
            cin = FEAT if s == 0 else FEAT + 19 + 38
            proj = 256 if s == 0 else 128
            dw0, pw0, inner, projk, predk, proj = fuse_stage(
                br, cin, proj, grouped)
            inp = feat if s == 0 else jnp.concatenate(
                [feat, conf, paf], axis=-1)
            y = relu(conv(inp, dw0.astype(dt), groups=cin))
            y = relu(conv(y, pw0.astype(dt)))
            for dwi, pwi in inner:
                y = relu(conv(y, dwi.astype(dt), groups=2 * MID))
                y = relu(conv(y, pwi.astype(dt),
                              groups=2 if grouped else 1))
            y = relu(conv(y, projk.astype(dt),
                          groups=2 if grouped else 1))
            z = conv(y, predk.astype(dt))
            conf, paf = z[..., :outs[0]], z[..., outs[0]:]
        return conf, paf

    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, FEAT)), jnp.bfloat16))

    ca, pa = jax.jit(lambda a: run_separate(a, jnp.float32))(x)
    for g in (False, True):
        cb, pb = jax.jit(lambda a, g=g: run_fused(a, jnp.float32, g))(x)
        err = float(jnp.max(jnp.abs(ca - cb)) / jnp.max(jnp.abs(ca)))
        print(f"fused grouped={g} rel err: {err:.2e}")
        assert err < 3e-2

    for name, fn in [("separate", lambda a: run_separate(a, jnp.bfloat16)),
                     ("fused", lambda a: run_fused(a, jnp.bfloat16, False)),
                     ("fused-g", lambda a: run_fused(a, jnp.bfloat16, True))]:
        @jax.jit
        def step(a, carry, fn=fn):
            c, p = fn(a + carry.astype(a.dtype) * 1e-12)
            return (jnp.sum(c.astype(jnp.float32))
                    + jnp.sum(p.astype(jnp.float32)))
        t = timed(step, x)
        print(f"{name:9s}: {t*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
