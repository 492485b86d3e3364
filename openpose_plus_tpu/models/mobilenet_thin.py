"""MobileNet-thin: depthwise-separable backbone, the fast model of the zoo.

Behavior-level match of the reference's models_mobilenet.py [HIGH behavior,
MED exact layer plan; empty mount — SURVEY.md §2 "MobileNet-thin model"]:
MobileNet v1 at a thin width multiplier (0.75), a multi-scale feature
concat (stride-4 features pooled onto the stride-8 grid), and smaller
separable-conv stage heads.

Depthwise convs are the TPU-specific hot spot (tiny arithmetic intensity);
ops/pallas owns the custom kernel when profiling shows XLA leaving
performance on the table.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from openpose_plus_tpu.config import ModelConfig
from openpose_plus_tpu.models import common


def _w(width: float, c: int) -> int:
    """Width-multiplied channel count, rounded to a multiple of 8 (TPU lane
    friendliness; the reference rounds to arbitrary ints)."""
    return max(8, int(round(c * width / 8)) * 8)


class MobileNetThinPose(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        d = self.cfg.compute_dtype
        w = self.cfg.width_multiplier
        fz = self.cfg.fused_inference
        x = x.astype(common._dtype(d))
        # Stem + stride-2 region: conv1 (3x3 s2), dw1, dw2 (s2 -> stride 4).
        # With stem_s2d the SAME params lower via space-to-depth
        # (checkpoint-identical; see common.py deep-s2d notes). Tiers by
        # input shape: the DEEP tier keeps conv1/dw1/dw2 on the (H/4, W/4)
        # block grid (3.6x the plain chain; needs H,W % 4 == 0 or a
        # pre-transformed s2d^2 input (B,H/4,W/4,48)); the s2d-stem tier
        # lowers only conv1 (H,W % 2 == 0 or s2d input (B,H/2,W/2,12));
        # otherwise the plain lowering. int8 mode keeps the plain tier
        # (the deep tier's dense rearrangements are float-path only).
        c = x.shape[-1]
        mod4 = x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        deep = (self.cfg.stem_s2d and d != "int8"
                and (c == 48 or (c == 3 and mod4) or (c == 12 and even)))
        if deep:
            if c == 3:
                x = common.space_to_depth(common.space_to_depth(x))
            elif c == 12:
                x = common.space_to_depth(x)
            x = common.StemConvRelu(_w(w, 32), compute_dtype=d,
                                    name="conv1")(x)  # s2d-layout out
            x = common.SepConvRelu(_w(w, 64), compute_dtype=d,
                                   s2d_space=True, name="dw1")(x)
            x = common.SepConvRelu(_w(w, 128), stride=2, compute_dtype=d,
                                   s2d_space=True, name="dw2")(x)  # plain
        else:
            if c == 48 or (c == 12 and d == "int8"):
                raise ValueError(
                    "space-to-depth input layouts need stem_s2d and a "
                    "float compute mode; feed plain (B, H, W, 3) images")
            # int8 keeps the plain ConvRelu stem: it owns the quantized
            # conv1 path and its calib act_scale (StemConvRelu is
            # float-only, and swapping it in would silently change the
            # int8 numerics AND the calib tree structure).
            if self.cfg.stem_s2d and d != "int8" and (even or c == 12):
                x = common.StemConvRelu(_w(w, 32), compute_dtype=d,
                                        name="conv1")(x)  # stride 2
            else:
                x = common.ConvRelu(_w(w, 32), stride=2, compute_dtype=d,
                                    name="conv1")(x)      # stride 2
            x = common.SepConvRelu(_w(w, 64), compute_dtype=d, name="dw1")(x)
            x = common.SepConvRelu(_w(w, 128), stride=2, compute_dtype=d,
                                   name="dw2")(x)          # stride 4
        x = common.SepConvRelu(_w(w, 128), compute_dtype=d, name="dw3")(x)
        feat_s4 = x
        x = common.SepConvRelu(_w(w, 256), stride=2, compute_dtype=d,
                               name="dw4")(x)         # stride 8
        x = common.SepConvRelu(_w(w, 256), compute_dtype=d, fused=fz,
                               name="dw5")(x)
        x = common.SepConvRelu(_w(w, 512), compute_dtype=d, fused=fz,
                               name="dw6")(x)
        for i in range(3):
            x = common.SepConvRelu(_w(w, 512), compute_dtype=d, fused=fz,
                                   name=f"dw{7 + i}")(x)
        # Multi-scale concat: pool the stride-4 features onto the stride-8
        # grid and fuse (reference concatenates multiple backbone taps).
        pooled = nn.max_pool(feat_s4, (2, 2), strides=(2, 2))
        feature = jnp.concatenate([pooled, x], axis=-1)
        # Materialize once: `feature` has 7+ consumers (both stage-1
        # branches and every later stage's input concat); without the
        # barrier XLA re-gathers (pooled, x) per consumer — same
        # re-gather pathology as the stage-input concat in
        # common.MultiStageHead (see device trace, ARCHITECTURE.md).
        # Same gate as there: wins at serving/training batches, loses
        # past the alternate-memory working set.
        if feature.shape[0] <= 16:
            feature = jax.lax.optimization_barrier(feature)
        # 3x3 separable stage convs (the reference thin-model family's
        # choice): a depthwise 7x7 over the 441-ch stage input is VPU-bound
        # and ~2.5x the stage cost for no capacity gain.
        confs, pafs = common.MultiStageHead(
            n_heatmaps=self.cfg.n_heatmaps, n_pafs=self.cfg.n_pafs,
            n_stages=self.cfg.n_stages,
            stage1_convs=3, stage1_kernel=3, stage1_proj=256,
            refine_convs=3, refine_kernel=3, refine_mid=128,
            separable=True, remat=self.cfg.remat_stages, fused=fz,
            compute_dtype=d, name="stages")(feature)
        return dict(conf=confs, paf=pafs, feature=feature)
