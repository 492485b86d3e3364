"""Heatmap peak detection on-device: upsample -> smooth -> NMS -> top-K.

TPU-native replacement for the reference's get_peak_map / smoothed-NMS stage
(src/paf.cpp :: get_peak_map and the Python estimator's gaussian_filter +
local-max [MED file names; empty mount — SURVEY.md]). Everything is static
shape: each part channel keeps its top `max_peaks` peaks, invalid slots are
masked, and the whole stage jit-compiles and vmaps over the batch.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from openpose_plus_tpu import skeleton
from openpose_plus_tpu.postproc import common


@flax.struct.dataclass
class PeakSet:
    """Top-K peaks per part for one image (map-resolution coordinates)."""

    y: jax.Array          # (n_parts, K) int32 row coord
    x: jax.Array          # (n_parts, K) int32 col coord
    score: jax.Array      # (n_parts, K) float32 heatmap value at peak
    valid: jax.Array      # (n_parts, K) bool
    refined_y: jax.Array  # (n_parts, K) float32 subpixel row coord
    refined_x: jax.Array  # (n_parts, K) float32 subpixel col coord


def upsample(maps: jax.Array, factor: int) -> jax.Array:
    """Bilinear upsample (H, W, C) by an integer factor (half-pixel centers,
    matching oracle.upsample_maps / the reference's ~8x resize)."""
    if factor == 1:
        return maps
    h, w, c = maps.shape
    return jax.image.resize(maps, (h * factor, w * factor, c), method="linear")


def gaussian_smooth(maps: jax.Array, sigma: float) -> jax.Array:
    """Separable zero-padded Gaussian blur over (H, W, C)."""
    k = common.gaussian_kernel_1d(sigma)
    if k.size == 1:
        return maps
    c = maps.shape[-1]
    kern = jnp.asarray(k)
    x = maps[None]  # NHWC
    # depthwise separable: rows then cols
    krow = jnp.tile(kern.reshape(k.size, 1, 1, 1), (1, 1, 1, c))
    kcol = jnp.tile(kern.reshape(1, k.size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, krow.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    r = k.size // 2
    # HIGHEST precision: the default conv path multiplies in reduced
    # precision (bf16-class) which breaks bit-parity with the numpy oracle;
    # this kernel is tiny so exact f32 costs nothing.
    x = jax.lax.conv_general_dilated(
        x, krow, (1, 1), [(r, r), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kcol, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return x[0]


def _subpixel_refine(m_flat: jax.Array, y: jax.Array, x: jax.Array,
                     h: int, w: int) -> tuple[jax.Array, jax.Array]:
    """Quadratic 3-tap refinement; zero offset at borders (matches oracle)."""

    def at(yy, xx):
        return m_flat[yy * w + xx]

    def axis_offset(center, prev, nxt):
        denom = 2.0 * center - nxt - prev
        off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (nxt - prev) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    c = at(y, x)
    ox = axis_offset(c, at(y, jnp.maximum(x - 1, 0)),
                     at(y, jnp.minimum(x + 1, w - 1)))
    oy = axis_offset(c, at(jnp.maximum(y - 1, 0), x),
                     at(jnp.minimum(y + 1, h - 1), x))
    ox = jnp.where((x > 0) & (x < w - 1), ox, 0.0)
    oy = jnp.where((y > 0) & (y < h - 1), oy, 0.0)
    return y.astype(jnp.float32) + oy, x.astype(jnp.float32) + ox


def _topk_iterative(flat: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k via k rounds of (argmax, mask) — (P, N) -> (P, k).

    Matches lax.top_k ordering for all slots with finite scores: descending
    value, ties broken by ascending index (argmax returns the lowest index
    of the max). ~7x faster than lax.top_k's sort-based lowering on TPU for
    the (18, H*W) peak-extraction shape; exhausted slots (-inf) repeat
    index 0 where top_k would return distinct indices, but every consumer
    masks those slots via `score > threshold` first.
    """
    n = flat.shape[-1]
    iota = jnp.arange(n)[None, :]

    def body(t, carry):
        rem, scores, idxs = carry
        j = jnp.argmax(rem, axis=-1)
        s = jnp.max(rem, axis=-1)
        scores = scores.at[:, t].set(s)
        idxs = idxs.at[:, t].set(j.astype(jnp.int32))
        rem = jnp.where(iota == j[:, None], -jnp.inf, rem)
        return rem, scores, idxs

    p = flat.shape[0]
    init = (flat, jnp.zeros((p, k), flat.dtype), jnp.zeros((p, k), jnp.int32))
    _, scores, idxs = jax.lax.fori_loop(0, k, body, init)
    return scores, idxs


def find_peaks(smoothed: jax.Array, threshold: float, max_peaks: int
               ) -> PeakSet:
    """3x3 local-max NMS + per-part top-K on smoothed (H, W, >=18) maps.

    A pixel is a peak iff it equals the 3x3 max-pool (i.e. >= all 8
    neighbors under -inf padding) and is strictly above `threshold`;
    ordering is descending score with ties broken by ascending flat index
    (lax.top_k semantics), identical to oracle.find_peaks.
    """
    h, w = smoothed.shape[0], smoothed.shape[1]
    parts = smoothed[:, :, : skeleton.N_PARTS]
    # Separable 3x3 max-pool via shifted maxes (-inf padding). Identical to
    # reduce_window but fuses into the surrounding elementwise ops on TPU
    # (reduce_window lowers to a windowed reduction that costs ~1.7ms at
    # batch-8 bench shapes; this is free).
    p = jnp.pad(parts, ((1, 1), (0, 0), (0, 0)), constant_values=-jnp.inf)
    rows = jnp.maximum(jnp.maximum(p[:-2], p[1:-1]), p[2:])
    q = jnp.pad(rows, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
    pooled = jnp.maximum(jnp.maximum(q[:, :-2], q[:, 1:-1]), q[:, 2:])
    is_peak = (parts >= pooled) & (parts > threshold)
    flat = jnp.where(is_peak, parts, -jnp.inf).reshape(h * w, skeleton.N_PARTS)
    flat = flat.T  # (n_parts, H*W)
    score, idx = _topk_iterative(flat, max_peaks)
    valid = score > threshold
    idx = jnp.where(valid, idx, 0)
    y = (idx // w).astype(jnp.int32)
    x = (idx % w).astype(jnp.int32)
    m_flat = parts.reshape(h * w, skeleton.N_PARTS).T  # (n_parts, H*W)
    ry, rx = jax.vmap(lambda mf, yy, xx: _subpixel_refine(mf, yy, xx, h, w))(
        m_flat, y, x)
    return PeakSet(
        y=y, x=x,
        score=jnp.where(valid, score, 0.0).astype(jnp.float32),
        valid=valid,
        refined_y=ry, refined_x=rx,
    )
