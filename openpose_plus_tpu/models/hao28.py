"""hao28-experimental: the compact contributor architecture of the zoo.

Behavior-level match of the reference's models_hao28_experimental.py
[MED exact layer plan; empty mount — SURVEY.md §2]: a compact plain-conv
backbone (the reference shipped pretrained weights for this one as
hao28-pose600000.npz) with lighter stage heads.
"""

from __future__ import annotations

import flax.linen as nn

from openpose_plus_tpu.config import ModelConfig
from openpose_plus_tpu.models import common


class Hao28Pose(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        d = self.cfg.compute_dtype
        x = x.astype(common._dtype(d))
        # conv1 block on the space-to-depth grid when the lowering is
        # available (same params; lane-starved low-channel convs run as
        # MXU-shaped block-grid convs and the pool is a free channel max
        # -- common.S2DConvRelu; vgg_block gates eligibility itself).
        x = common.vgg_block(x, (32, 32), d, "conv1",
                             s2d_stem=self.cfg.stem_s2d)
        x = common.vgg_block(x, (64, 64), d, "conv2")
        x = common.vgg_block(x, (128, 128, 128, 128), d, "conv3")
        x = common.vgg_block(x, (256, 128), d, "conv4", pool=False)
        feature = x
        confs, pafs = common.MultiStageHead(
            n_heatmaps=self.cfg.n_heatmaps, n_pafs=self.cfg.n_pafs,
            n_stages=self.cfg.n_stages,
            stage1_convs=3, stage1_kernel=3, stage1_proj=256,
            refine_convs=3, refine_kernel=3, refine_mid=128,
            remat=self.cfg.remat_stages,
            compute_dtype=d, name="stages")(feature)
        return dict(conf=confs, paf=pafs,
                    feature=common.dequant(feature))
