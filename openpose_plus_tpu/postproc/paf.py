"""PAF line-integral limb scoring + greedy bipartite assignment, on-device.

TPU-native replacement for the candidate-generation/scoring/assignment part
of the reference grouping (src/paf.cpp connection scoring; Python estimator
equivalent [MED names; empty mount — SURVEY.md §2]). All limbs and all K x K
peak-pair candidates are scored densely in one fused computation (VPU-friendly
gathers, no data-dependent shapes); the greedy assignment is expressed as
max_peaks iterations of masked argmax, which is exactly equivalent to the
reference's scan-sorted-candidates-and-skip-conflicts greedy order.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from openpose_plus_tpu import skeleton
from openpose_plus_tpu.postproc import common
from openpose_plus_tpu.postproc.nms import PeakSet


@flax.struct.dataclass
class Connections:
    """Accepted limb connections for one image, in greedy-accept order.

    Slot t of limb l is the t-th accepted connection (or invalid).
    """

    slot_a: jax.Array  # (n_limbs, K) int32 peak slot of endpoint A
    slot_b: jax.Array  # (n_limbs, K) int32 peak slot of endpoint B
    score: jax.Array   # (n_limbs, K) float32 prior-adjusted limb score
    valid: jax.Array   # (n_limbs, K) bool


def _sample_paf_gather(paf: jax.Array, sy: jax.Array, sx: jax.Array
                       ) -> tuple[jax.Array, jax.Array]:
    """NN-sample both PAF channels of every limb at (L, S, K, K) coords
    via XLA gather — fastest lowering on CPU (the test backend)."""
    h, w = paf.shape[0], paf.shape[1]
    chans = jnp.asarray(skeleton.paf_channels_array())   # (L, 2)
    flat_idx = sy * w + sx                               # (L, S, K, K)
    paf_flat = paf.reshape(h * w, paf.shape[2])          # (HW, 38)
    px = jax.vmap(lambda idx, c: paf_flat[:, c][idx])(flat_idx, chans[:, 0])
    py = jax.vmap(lambda idx, c: paf_flat[:, c][idx])(flat_idx, chans[:, 1])
    return px, py


def _sample_paf_onehot(paf: jax.Array, sy: jax.Array, sx: jax.Array
                       ) -> tuple[jax.Array, jax.Array]:
    """Same sampling as _sample_paf_gather, lowered as two one-hot
    contractions on the MXU (~8x faster than gather on TPU).

    value(n) = sum_y sum_x onehot_y(n,y) * onehot_x(n,x) * paf[y,x,c] has
    exactly one nonzero term, and one-hot weights are exactly representable
    in every MXU pass dtype, so with Precision.HIGHEST (multi-pass bf16x3
    for f32 operands) the result is BIT-IDENTICAL to the gather.
    """
    h, w = paf.shape[0], paf.shape[1]
    l, s, k, _ = sy.shape
    n = s * k * k
    chans = skeleton.paf_channels_array()                # (L, 2) static
    paf_pairs = paf[:, :, jnp.asarray(chans)]            # (H, W, L, 2)
    syf = sy.reshape(l, n)
    sxf = sx.reshape(l, n)
    oy = (syf[..., None] == jnp.arange(h)).astype(jnp.float32)   # (L, n, H)
    ox = (sxf[..., None] == jnp.arange(w)).astype(jnp.float32)   # (L, n, W)
    t = jnp.einsum("lnh,hwlc->lnwc", oy, paf_pairs,
                   precision=jax.lax.Precision.HIGHEST)
    vals = jnp.einsum("lnw,lnwc->lnc", ox, t,
                      precision=jax.lax.Precision.HIGHEST)
    px = vals[..., 0].reshape(l, s, k, k)
    py = vals[..., 1].reshape(l, s, k, k)
    return px, py


def _lowres_axis_weights(coords_up: jax.Array, size_lo: int, factor: int
                         ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bilinear taps on the low-res axis for integer coords on the upsampled
    axis, reproducing jax.image.resize('linear')'s weight matrix exactly.

    resize (half-pixel centers, translation 0) puts upsampled pixel i at
    source coordinate s = (i + 0.5)/factor - 0.5 with triangle-kernel weights
    (1-d, d) on (floor(s), floor(s)+1), normalized over in-range taps. For
    power-of-two factors every quantity here is dyadic, so the weights are
    bit-identical to compute_weight_mat's (the downstream *contraction* is
    only ulp-identical — see _sample_paf_lowres).
    """
    s = (coords_up.astype(jnp.float32) + 0.5) * (1.0 / factor) - 0.5
    i0f = jnp.floor(s)
    d = s - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = i0 + 1
    in0 = (i0 >= 0) & (i0 < size_lo)
    in1 = (i1 >= 0) & (i1 < size_lo)
    w0 = jnp.where(in0, 1.0 - d, 0.0)
    w1 = jnp.where(in1, d, 0.0)
    total = w0 + w1  # exactly 1.0 interior; single-tap weight at the edges
    w0 = w0 / total
    w1 = w1 / total
    return jnp.clip(i0, 0, size_lo - 1), jnp.clip(i1, 0, size_lo - 1), w0, w1


def _sample_paf_lowres(paf_lo: jax.Array, sy: jax.Array, sx: jax.Array,
                       factor: int) -> tuple[jax.Array, jax.Array]:
    """Sample the `factor`-upsampled PAF at integer coords (sy, sx) WITHOUT
    materializing the upsampled map: bilinear-resize output values are a
    <=2x2-tap contraction of the low-res map, so the one-hot rows of
    _sample_paf_onehot become 2-hot resize-weight rows on a map `factor**2`x
    smaller — same MXU lowering, ~factor^2 fewer FLOPs and no (H, W, 38)
    upsample in HBM. Matches gather-on-resized to ~1 ulp (identical resize
    weights, but XLA dots use FMA so rounding depends on each lowering's
    reduction tree) — enforced on random + edge coords by
    tests/test_lowering_equiv.py.
    """
    h, w = paf_lo.shape[0], paf_lo.shape[1]
    l, s, k, _ = sy.shape
    n = s * k * k
    chans = skeleton.paf_channels_array()                # (L, 2) static
    paf_pairs = paf_lo[:, :, jnp.asarray(chans)]         # (h, w, L, 2)
    syf = sy.reshape(l, n)
    sxf = sx.reshape(l, n)
    y0, y1, wy0, wy1 = _lowres_axis_weights(syf, h, factor)
    x0, x1, wx0, wx1 = _lowres_axis_weights(sxf, w, factor)
    ar_h = jnp.arange(h)
    ar_w = jnp.arange(w)
    # For power-of-two factors the 2-hot matrices are stored bf16: every
    # resize weight is a dyadic rational k/(2*factor) (plus exact 0/1 at
    # edges), representable in bf16's 8 mantissa bits for any factor <=
    # 128, and the HIGHEST-precision dot upcasts bf16 operands to f32
    # losslessly — identical values at half the HBM traffic for the
    # largest tensors here. Other factors (non-dyadic weights like 1/6)
    # keep f32 so the ~1-ulp agreement with resize+gather still holds.
    dt = (jnp.bfloat16 if factor & (factor - 1) == 0 else jnp.float32)
    oy = (wy0[..., None] * (y0[..., None] == ar_h)
          + wy1[..., None] * (y1[..., None] == ar_h)).astype(dt)  # (L, n, h)
    ox = (wx0[..., None] * (x0[..., None] == ar_w)
          + wx1[..., None] * (x1[..., None] == ar_w)).astype(dt)  # (L, n, w)
    # Contract the LONGER spatial axis first so the (L, n, short, 2)
    # intermediate is as small as possible (maps are wider than tall at
    # the reference aspect). NOT bit-identical to resize+gather either
    # way: XLA dots fuse multiply-add (FMA), so rounding depends on the
    # lowering's reduction tree — the paths agree to ~1 ulp, which the
    # toleranced parity tests absorb (the CPU decode path likewise
    # differs from the numpy oracle at the ulp level).
    prec = jax.lax.Precision.HIGHEST
    if w >= h:
        t = jnp.einsum("lnw,hwlc->lnhc", ox, paf_pairs, precision=prec,
                       preferred_element_type=jnp.float32)
        vals = jnp.einsum("lnh,lnhc->lnc", oy, t, precision=prec,
                          preferred_element_type=jnp.float32)
    else:
        t = jnp.einsum("lnh,hwlc->lnwc", oy, paf_pairs, precision=prec,
                       preferred_element_type=jnp.float32)
        vals = jnp.einsum("lnw,lnwc->lnc", ox, t, precision=prec,
                          preferred_element_type=jnp.float32)
    px = vals[..., 0].reshape(l, s, k, k)
    py = vals[..., 1].reshape(l, s, k, k)
    return px, py


def score_candidates(paf: jax.Array, peaks: PeakSet, n_samples: int,
                     sample_threshold: float, inlier_ratio: float,
                     lowres_factor: int = 1) -> jax.Array:
    """Dense candidate scores, (n_limbs, K, K); invalid pairs -> -inf.

    Nearest-neighbor PAF sampling at `n_samples` points along each segment
    (reference convention), mean dot with the unit limb direction, height
    prior penalty, >=ceil(ratio*n) inlier samples above sample_threshold.

    With `lowres_factor > 1`, `paf` is the RAW network-resolution map and
    peak coords live on the `lowres_factor`-upsampled grid; sampling then
    reads the upsampled values without materializing the upsample (TPU:
    factored 2-hot contraction; CPU: resize + gather — paths agree to ~1
    ulp, see _sample_paf_lowres).
    """
    paf = jnp.asarray(paf)
    h = paf.shape[0] * lowres_factor
    w = paf.shape[1] * lowres_factor
    pairs = jnp.asarray(skeleton.pairs_array())          # (L, 2)
    fracs = jnp.asarray(common.line_sample_fracs(n_samples))  # (S,)

    ax = peaks.x[pairs[:, 0]].astype(jnp.float32)  # (L, K)
    ay = peaks.y[pairs[:, 0]].astype(jnp.float32)
    bx = peaks.x[pairs[:, 1]].astype(jnp.float32)
    by = peaks.y[pairs[:, 1]].astype(jnp.float32)
    va = peaks.valid[pairs[:, 0]]
    vb = peaks.valid[pairs[:, 1]]

    dx = bx[:, None, :] - ax[:, :, None]   # (L, K, K)
    dy = by[:, None, :] - ay[:, :, None]
    dist = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1e-4)
    ux, uy = dx / dist, dy / dist

    # Sample points: (L, S, K, K) integer coords.
    sx = jnp.round(ax[:, None, :, None]
                   + fracs[None, :, None, None] * dx[:, None]).astype(jnp.int32)
    sy = jnp.round(ay[:, None, :, None]
                   + fracs[None, :, None, None] * dy[:, None]).astype(jnp.int32)

    if lowres_factor > 1:
        if common.tpu_backend():
            px, py = _sample_paf_lowres(paf, sy, sx, lowres_factor)
        else:
            from openpose_plus_tpu.postproc import nms
            px, py = _sample_paf_gather(nms.upsample(paf, lowres_factor),
                                        sy, sx)
    else:
        sample = (_sample_paf_onehot if common.tpu_backend()
                  else _sample_paf_gather)
        px, py = sample(paf, sy, sx)

    dots = px * ux[:, None] + py * uy[:, None]                # (L, S, K, K)
    mean_dot = jnp.mean(dots, axis=1)
    inliers = jnp.sum(dots > sample_threshold, axis=1)
    prior = jnp.minimum(0.5 * h / dist - 1.0, 0.0)
    score = mean_dot + prior

    min_inliers = int(np.ceil(inlier_ratio * n_samples))
    ok = ((inliers >= min_inliers) & (score > 0)
          & va[:, :, None] & vb[:, None, :])
    return jnp.where(ok, score, -jnp.inf)


def greedy_assign(scores: jax.Array, max_peaks: int) -> Connections:
    """Greedy best-first assignment per limb via iterated masked argmax.

    Iteration t takes the global max over remaining candidates (ties ->
    lowest row-major (slot_a, slot_b) index, matching the oracle's stable
    sort) and masks its row and column; equivalent to scanning candidates in
    descending-score order and skipping used endpoints.
    """
    n_limbs, k, _ = scores.shape
    if k != max_peaks:
        raise ValueError(f"scores K={k} != max_peaks={max_peaks}")

    def per_limb(limb_scores):
        def body(t, carry):
            remaining, sa, sb, sc, ok = carry
            flat = remaining.reshape(-1)
            j = jnp.argmax(flat)
            best = flat[j]
            valid = best > -jnp.inf
            ja, jb = j // k, j % k
            remaining = jnp.where(
                valid,
                remaining.at[ja, :].set(-jnp.inf).at[:, jb].set(-jnp.inf),
                remaining)
            sa = sa.at[t].set(jnp.where(valid, ja, 0).astype(jnp.int32))
            sb = sb.at[t].set(jnp.where(valid, jb, 0).astype(jnp.int32))
            sc = sc.at[t].set(jnp.where(valid, best, 0.0))
            ok = ok.at[t].set(valid)
            return remaining, sa, sb, sc, ok

        init = (limb_scores,
                jnp.zeros((k,), jnp.int32), jnp.zeros((k,), jnp.int32),
                jnp.zeros((k,), jnp.float32), jnp.zeros((k,), bool))
        _, sa, sb, sc, ok = jax.lax.fori_loop(0, k, body, init)
        return sa, sb, sc, ok

    sa, sb, sc, ok = jax.vmap(per_limb)(scores)
    return Connections(slot_a=sa, slot_b=sb, score=sc, valid=ok)
