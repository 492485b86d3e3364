"""End-to-end on-device decoding: (conf, paf) maps -> fixed-size skeletons.

This is the single JAX pipeline that replaces the reference's host-side
grouping on BOTH its paths (Python estimator and src/paf.cpp; SURVEY.md §2).
It is pure, static-shape, jit-compiled and vmapped over the batch, so the
whole post-processing stage fuses into the same XLA program as the CNN
forward pass — zero host round-trips.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from openpose_plus_tpu.config import PostprocConfig
from openpose_plus_tpu.postproc import common, group, nms, paf


@flax.struct.dataclass
class HumanBatch:
    """Fixed-capacity skeleton results for a batch of images.

    Coordinates are normalized to [0, 1] in network-input space using the
    pixel-center convention (px + 0.5) / extent, so they rescale to any
    original image size. Rows are compacted: valid humans first, sorted by
    descending mean score.
    """

    coords: jax.Array       # (B, M, 18, 2) float32 — (x, y) normalized
    part_scores: jax.Array  # (B, M, 18) float32 peak score (0 if absent)
    part_valid: jax.Array   # (B, M, 18) bool
    score: jax.Array        # (B, M) float32 mean score (peaks+connections)/count
    n_parts: jax.Array      # (B, M) int32
    valid: jax.Array        # (B, M) bool

    @property
    def num_humans(self) -> jax.Array:
        return jnp.sum(self.valid, axis=-1)

    def to_list(self, batch_index: int = 0) -> list[dict]:
        """Host-side list-of-humans view (the reference's [Human] result
        type): [{'parts': {part: (x, y, score)}, 'score': float}]."""
        import numpy as np

        out = []
        valid = np.asarray(self.valid[batch_index])
        coords = np.asarray(self.coords[batch_index])
        pvalid = np.asarray(self.part_valid[batch_index])
        pscore = np.asarray(self.part_scores[batch_index])
        score = np.asarray(self.score[batch_index])
        for m in np.nonzero(valid)[0]:
            parts = {
                int(p): (float(coords[m, p, 0]), float(coords[m, p, 1]),
                         float(pscore[m, p]))
                for p in np.nonzero(pvalid[m])[0]
            }
            out.append({"parts": parts, "score": float(score[m])})
        return out


def preprocess_single(conf: jax.Array, paf_map: jax.Array,
                      cfg: PostprocConfig) -> tuple[jax.Array, jax.Array]:
    """Upsample both map stacks and smooth the confidence maps.

    Exposed separately so parity tests can feed the numpy oracle the exact
    floats the JAX pipeline consumes (peak plateaus compare floats for
    equality, so shared inputs are required for bit-exact parity).
    """
    smoothed = nms.upsample_smooth(conf, cfg.upsample_factor,
                                   cfg.smooth_sigma)
    paf_u = nms.upsample(paf_map, cfg.upsample_factor)
    return smoothed, paf_u


def _decode_single(conf: jax.Array, paf_map: jax.Array,
                   cfg: PostprocConfig) -> HumanBatch:
    """Decode one image's (H, W, 19) conf + (H, W, 38) paf maps."""
    # Only the smoothed conf maps are materialized at upsampled resolution
    # (peak finding needs the actual grid) — upsample+smooth run as ONE
    # fused pair of contractions. PAF sampling reads upsampled values
    # directly from the raw map via score_candidates(lowres_factor=...),
    # to ~1 ulp (tests/test_lowering_equiv.py) — this skips a
    # (H*f, W*f, 38) HBM round-trip and cuts the sampling contraction f^2 x.
    smoothed = nms.upsample_smooth(conf, cfg.upsample_factor,
                                   cfg.smooth_sigma)
    peaks = nms.find_peaks(smoothed, cfg.peak_threshold, cfg.max_peaks)
    cand_scores = paf.score_candidates(
        paf_map, peaks, cfg.paf_n_samples, cfg.paf_sample_threshold,
        cfg.paf_inlier_ratio, lowres_factor=cfg.upsample_factor)

    k = cfg.max_peaks
    peak_score_flat = peaks.score.reshape(-1)           # (18*K,)
    # TPU backends take the Pallas kernels for the serial tail; CPU (tests)
    # takes the XLA twins. Oracle parity and kernel-vs-XLA equality are
    # both test-enforced (test_postproc_parity, test_pallas_*).
    if common.tpu_backend():
        from openpose_plus_tpu.ops.pallas.greedy import greedy_assign_pallas
        from openpose_plus_tpu.ops.pallas.merge import assemble_pallas

        conns = greedy_assign_pallas(cand_scores, k)
        subsets = assemble_pallas(conns, peaks.score, k, cfg.max_humans)
    else:
        conns = paf.greedy_assign(cand_scores, k)
        subsets = group.assemble(conns, peak_score_flat, k, cfg.max_humans)

    h, w = smoothed.shape[0], smoothed.shape[1]
    rx_flat = ((peaks.refined_x + 0.5) / w).reshape(-1)
    ry_flat = ((peaks.refined_y + 0.5) / h).reshape(-1)

    gids = subsets.parts                                 # (M, 18)
    part_valid = gids >= 0
    safe = jnp.where(part_valid, gids, 0)
    # Look up (x, y, score) per assigned peak as ONE one-hot matmul instead
    # of three scalar gathers (gathers serialize on TPU; a one-hot row
    # selects exactly one value, so this is bit-identical at HIGHEST).
    table = jnp.stack([rx_flat, ry_flat, peak_score_flat], axis=-1)
    onehot = (safe.reshape(-1)[:, None]
              == jnp.arange(table.shape[0])).astype(table.dtype)
    vals = jnp.matmul(onehot, table,
                      precision=jax.lax.Precision.HIGHEST)  # (M*18, 3)
    vals = vals.reshape(*safe.shape, 3)
    coords = jnp.where(part_valid[..., None], vals[..., :2], 0.0)
    part_scores = jnp.where(part_valid, vals[..., 2], 0.0)

    count = subsets.count
    mean_score = jnp.where(count > 0, subsets.score / jnp.maximum(count, 1), 0.0)
    valid = ((count >= cfg.min_parts_per_human)
             & (mean_score > cfg.min_human_score))

    # Compact: valid humans first, by descending mean score.
    order = jnp.argsort(-jnp.where(valid, mean_score, -jnp.inf))
    return HumanBatch(
        coords=coords[order].astype(jnp.float32),
        part_scores=part_scores[order].astype(jnp.float32),
        part_valid=part_valid[order] & valid[order, None],
        score=mean_score[order].astype(jnp.float32),
        n_parts=count[order].astype(jnp.int32),
        valid=valid[order],
    )


def decode_maps(conf: jax.Array, paf_map: jax.Array,
                cfg: PostprocConfig) -> HumanBatch:
    """Batched decode: (B, H, W, 19) + (B, H, W, 38) -> HumanBatch.

    Call inside jit (cfg is static); maps should be float32 — upstream
    bfloat16 model outputs are upcast here to keep peak ordering stable.
    """
    conf = conf.astype(jnp.float32)
    paf_map = paf_map.astype(jnp.float32)
    return jax.vmap(functools.partial(_decode_single, cfg=cfg))(conf, paf_map)


def build_decoder(cfg: PostprocConfig):
    """jit-compiled standalone decoder fn(conf, paf) -> HumanBatch."""
    return jax.jit(functools.partial(decode_maps, cfg=cfg))
