"""Pallas TPU kernels for the grouping stage's serial tail, plus
profiled-out reference kernels kept with their measurements.

In the engine (selected by postproc.common.tpu_backend()):
  merge.assemble_pallas        sequential CMU subset merge, dynamic trip count
  greedy.greedy_assign_pallas  per-limb greedy assignment, rounds unrolled

Measured slower than XLA on v5e and NOT used (STATUS notes in docstrings):
  sepconv.fused_sepconv        fused DW3x3+PW1x1 (XLA pair is at HBM roofline)
  paf_sample.sample_paf_pallas per-limb one-hot sampling (XLA einsum packs
                               the same MXU tile floor better)
"""
