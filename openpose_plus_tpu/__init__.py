"""openpose_plus_tpu — TPU-native multi-person 2D pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Aki57/openpose-plus (see SURVEY.md): swappable CNN backbones producing
stage-wise heatmaps + part-affinity fields, fully on-device vectorized
grouping into skeletons, data-parallel training and distributed COCO
evaluation over a named TPU device mesh.
"""

__version__ = "0.1.0"
