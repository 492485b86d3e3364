"""Model registry: string name -> Flax module.

Replaces the reference's get_model() string dispatch
(openpose_plus/models/__init__.py :: get_model [HIGH; empty mount —
SURVEY.md §2 "Model registry"]).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn

from openpose_plus_tpu.config import ModelConfig
from openpose_plus_tpu.models.hao28 import Hao28Pose
from openpose_plus_tpu.models.mobilenet_thin import MobileNetThinPose
from openpose_plus_tpu.models.vgg19 import VGG19Pose
from openpose_plus_tpu.models.vggtiny import VGGTinyPose

_REGISTRY: dict[str, Callable[[ModelConfig], nn.Module]] = {
    "vgg19": VGG19Pose,
    "vgg": VGG19Pose,            # reference alias --model=vgg
    "vggtiny": VGGTinyPose,
    "mobilenet_thin": MobileNetThinPose,
    "mobilenet": MobileNetThinPose,
    "hao28_experimental": Hao28Pose,
    "hao28": Hao28Pose,
}


def get_model(cfg: ModelConfig) -> nn.Module:
    """Build the model named by cfg.name."""
    try:
        cls = _REGISTRY[cfg.name]
    except KeyError:
        raise ValueError(
            f"unknown model {cfg.name!r}; have {sorted(set(_REGISTRY))}"
        ) from None
    return cls(cfg)


def model_names() -> list[str]:
    return sorted(set(_REGISTRY))
