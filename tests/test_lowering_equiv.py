"""Equivalence of the TPU-shaped lowerings vs their plain-XLA twins.

Two postproc stages ship two numerically identical lowerings (selected by
postproc.common.tpu_backend()):
  * PAF sampling: XLA gather (CPU) vs one-hot MXU contraction (TPU)
  * peak top-k:  lax.top_k semantics vs iterative argmax (all backends)
These tests pin BIT-EXACT agreement so the backend switch can never change
results — the oracle-parity suite then covers either lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpose_plus_tpu.postproc import nms, paf as jpaf


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("h,w", [(46, 54), (92, 164)])
def test_onehot_sampling_matches_gather(seed, h, w):
    rng = np.random.default_rng(seed)
    pafm = jnp.asarray(rng.random((h, w, 38), np.float32) - 0.5)
    l, s, k = 19, 10, 8
    sy = jnp.asarray(rng.integers(0, h, (l, s, k, k), np.int32))
    sx = jnp.asarray(rng.integers(0, w, (l, s, k, k), np.int32))
    gx, gy = jax.jit(jpaf._sample_paf_gather)(pafm, sy, sx)
    ox, oy = jax.jit(jpaf._sample_paf_onehot)(pafm, sy, sx)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(ox))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(oy))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("factor", [2, 8])
@pytest.mark.parametrize("h,w", [(46, 54),   # net output aspect (wide)
                                 (64, 48),   # tall
                                 (48, 48)])  # square
def test_lowres_sampling_matches_upsampled(seed, factor, h, w):
    """Factored 2-hot sampling on the RAW map == gather on the materialized
    jax.image.resize upsample to ~1 ulp: the resize weights are bit-equal
    (dyadic for power-of-two factors) but XLA dots use FMA, so the two
    lowerings' reduction trees round differently in the last bit. Values
    are O(1), so a couple of float32 ulps (~2.4e-7) bounds the difference."""
    rng = np.random.default_rng(seed)
    pafm = jnp.asarray(rng.random((h, w, 38), np.float32) - 0.5)
    paf_u = nms.upsample(pafm, factor)
    hu, wu = h * factor, w * factor
    l, s, k = 19, 10, 8
    sy = rng.integers(0, hu, (l, s, k, k)).astype(np.int32)
    sx = rng.integers(0, wu, (l, s, k, k)).astype(np.int32)
    # force edge rows/cols into the set (single-tap renormalized weights)
    sy[:, 0, 0, :] = 0
    sy[:, 0, 1, :] = hu - 1
    sx[:, 1, 0, :] = 0
    sx[:, 1, 1, :] = wu - 1
    sy, sx = jnp.asarray(sy), jnp.asarray(sx)
    gx, gy = jax.jit(jpaf._sample_paf_gather)(paf_u, sy, sx)
    fx, fy = jax.jit(
        lambda p, a, b: jpaf._sample_paf_lowres(p, a, b, factor))(pafm, sy, sx)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(fx), atol=2.4e-7)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(fy), atol=2.4e-7)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("factor,sigma", [(2, 1.25), (8, 5.0), (2, 0.0)])
def test_fused_upsample_smooth_matches_sequential(seed, factor, sigma):
    """upsample_smooth == gaussian_smooth(upsample(x)) to a few ulp (the
    composed float64 operator associates differently than the two-stage
    f32 path; both are ~1-ulp faithful). Also checks the refine path is
    unperturbed: one-hot patch selection is exact under any reduction."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((46, 54, 19), np.float32))
    seq = nms.gaussian_smooth(nms.upsample(x, factor), sigma)
    fused = jax.jit(lambda m: nms.upsample_smooth(m, factor, sigma))(x)
    assert fused.shape == seq.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(seq),
                               atol=5e-7)


@pytest.mark.parametrize("seed", [0, 1])
def test_subpixel_refine_matches_scalar_taps(seed):
    """One-hot patch extraction reproduces direct scalar indexing exactly
    (selection products are 1.0*v / 0.0*v — exact under FMA too)."""
    rng = np.random.default_rng(seed)
    h, w, p, k = 92, 164, 18, 16
    maps = jnp.asarray(rng.random((h, w, p), np.float32))
    y = rng.integers(0, h, (p, k)).astype(np.int32)
    x = rng.integers(0, w, (p, k)).astype(np.int32)
    y[:, 0] = 0; y[:, 1] = h - 1; x[:, 2] = 0; x[:, 3] = w - 1  # borders
    ry, rx = jax.jit(nms._subpixel_refine)(maps, jnp.asarray(y),
                                           jnp.asarray(x))
    m = np.asarray(maps)

    def offset(c, prev, nxt):
        den = 2.0 * np.float32(c) - np.float32(nxt) - np.float32(prev)
        if abs(den) <= 1e-6:
            return np.float32(0.0)
        return np.clip(np.float32(0.5) * (np.float32(nxt)
                                          - np.float32(prev)) / den,
                       -0.5, 0.5)

    for pi in range(p):
        for ki in range(k):
            yy, xx = int(y[pi, ki]), int(x[pi, ki])
            ox = offset(m[yy, xx, pi], m[yy, max(xx - 1, 0), pi],
                        m[yy, min(xx + 1, w - 1), pi])
            oy = offset(m[yy, xx, pi], m[max(yy - 1, 0), xx, pi],
                        m[min(yy + 1, h - 1), xx, pi])
            if not (0 < xx < w - 1):
                ox = np.float32(0.0)
            if not (0 < yy < h - 1):
                oy = np.float32(0.0)
            np.testing.assert_allclose(float(rx[pi, ki]), xx + ox,
                                       rtol=0, atol=1e-6)
            np.testing.assert_allclose(float(ry[pi, ki]), yy + oy,
                                       rtol=0, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_topk_iterative_matches_lax_topk(seed):
    rng = np.random.default_rng(seed)
    flat = rng.random((18, 1000)).astype(np.float32)
    # inject plateaus (exact ties) and sub-threshold rows
    flat[3, 100] = flat[3, 500] = flat[3, 700] = 0.9
    flat[5, :] = -np.inf
    flat[7, 10:14] = 0.95
    flat = jnp.asarray(flat)
    k = 16
    s_ref, i_ref = jax.jit(lambda f: jax.lax.top_k(f, k))(flat)
    s_it, i_it = jax.jit(lambda f: nms._topk_iterative(f, k))(flat)
    finite = np.isfinite(np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(s_ref)[finite],
                                  np.asarray(s_it)[finite])
    np.testing.assert_array_equal(np.asarray(i_ref)[finite],
                                  np.asarray(i_it)[finite])
    # -inf slots: scores agree (index may differ; consumers mask on score)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_it))


@pytest.mark.parametrize("c_in,c_out,h,w", [(64, 128, 12, 16), (24, 32, 9, 11)])
def test_fused_sepconv_matches_xla(c_in, c_out, h, w):
    """Pallas fused DW+PW (interpret mode) vs the XLA separable-conv path."""
    from flax import linen as nn

    from openpose_plus_tpu.models.common import SepConvRelu
    from openpose_plus_tpu.ops.pallas import sepconv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, c_in)).astype(np.float32))
    mod = SepConvRelu(c_out, compute_dtype="bfloat16")
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x.astype(jnp.bfloat16))

    p = params["params"]
    import functools
    fused = functools.partial(
        sepconv.fused_sepconv, dw_kernel=p["dw_kernel"], dw_bias=p["dw_bias"],
        pw_kernel=p["pw_kernel"], pw_bias=p["pw_bias"])
    import unittest.mock
    from jax.experimental import pallas as pl
    with unittest.mock.patch.object(
            pl, "pallas_call", functools.partial(pl.pallas_call,
                                                 interpret=True)):
        out = fused(x.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        rtol=0.05, atol=0.05)
    # identical fraction should be high: same math, different assoc. order
    same = np.mean(np.asarray(ref, np.float32) == np.asarray(out, np.float32))
    assert same > 0.8


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("h,w", [(46, 54), (92, 164)])
def test_pallas_paf_sampler_matches_gather(seed, h, w):
    """Pallas in-VMEM sampler (interpret mode) vs gather — bit-exact."""
    import functools
    import unittest.mock

    from jax.experimental import pallas as pl

    from openpose_plus_tpu.ops.pallas.paf_sample import sample_paf_pallas

    rng = np.random.default_rng(seed)
    pafm = jnp.asarray(rng.random((h, w, 38), np.float32) - 0.5)
    l, s, k = 19, 10, 16
    sy = jnp.asarray(rng.integers(0, h, (l, s, k, k), np.int32))
    sx = jnp.asarray(rng.integers(0, w, (l, s, k, k), np.int32))
    gx, gy = jax.jit(jpaf._sample_paf_gather)(pafm, sy, sx)
    with unittest.mock.patch.object(
            pl, "pallas_call", functools.partial(pl.pallas_call,
                                                 interpret=True)):
        ox, oy = sample_paf_pallas(pafm, sy, sx)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(ox))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(oy))
