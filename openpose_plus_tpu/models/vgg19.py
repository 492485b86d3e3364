"""VGG19-backbone OpenPose model (the CVPR'17 reference architecture).

Behavior-matches the reference's models_vgg.py [HIGH; empty mount —
SURVEY.md §2 "VGG19 full model"]: VGG19 conv1_1..conv4_2 backbone plus two
CPM convs producing the stride-8 feature F, then a 6-stage two-branch head
with 7x7 refinement convs and deep supervision.
"""

from __future__ import annotations

import flax.linen as nn

from openpose_plus_tpu.config import ModelConfig
from openpose_plus_tpu.models import common


class VGG19Pose(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        d = self.cfg.compute_dtype
        x = x.astype(common._dtype(d))
        # conv1 block on the space-to-depth grid when the lowering is
        # available (same params; lane-starved low-channel convs run as
        # MXU-shaped block-grid convs and the pool is a free channel max
        # -- common.S2DConvRelu; vgg_block gates eligibility itself).
        x = common.vgg_block(x, (64, 64), d, "conv1",
                             s2d_stem=self.cfg.stem_s2d)
        x = common.vgg_block(x, (128, 128), d, "conv2")
        x = common.vgg_block(x, (256, 256, 256, 256), d, "conv3")
        x = common.vgg_block(x, (512, 512), d, "conv4", pool=False)
        x = common.ConvRelu(256, compute_dtype=d, name="conv4_3_cpm")(x)
        feature = common.ConvRelu(128, compute_dtype=d, name="conv4_4_cpm")(x)
        confs, pafs = common.MultiStageHead(
            n_heatmaps=self.cfg.n_heatmaps, n_pafs=self.cfg.n_pafs,
            n_stages=self.cfg.n_stages, refine_kernel=7,
            remat=self.cfg.remat_stages,
            compute_dtype=d, name="stages")(feature)
        return dict(conf=confs, paf=pafs,
                    feature=common.dequant(feature))
