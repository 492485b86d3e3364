"""Model zoo shape/jit tests (the reference had only build-smoke tests;
SURVEY.md §4 — we additionally check stage counts, dtype policy, and jit)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpose_plus_tpu.config import ModelConfig
from openpose_plus_tpu.models import get_model, model_names


@pytest.mark.parametrize("name", ["vgg19", "vggtiny", "mobilenet_thin", "hao28"])
def test_model_shapes(name):
    # Small input keeps CPU compile fast; conv nets are resolution-agnostic.
    cfg = ModelConfig(name=name, hin=64, win=96, n_stages=3,
                      compute_dtype="float32")
    model = get_model(cfg)
    x = jnp.zeros((2, cfg.hin, cfg.win, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert len(out["conf"]) == cfg.n_stages
    assert len(out["paf"]) == cfg.n_stages
    for c, p in zip(out["conf"], out["paf"]):
        assert c.shape == (2, cfg.hout, cfg.wout, cfg.n_heatmaps)
        assert p.shape == (2, cfg.hout, cfg.wout, cfg.n_pafs)
        assert c.dtype == jnp.float32


def test_bf16_compute_f32_params_and_outputs():
    cfg = ModelConfig(name="vggtiny", hin=64, win=64, n_stages=2,
                      compute_dtype="bfloat16")
    model = get_model(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = model.apply(params, x)
    # final per-stage predictions are float32 for the decoder
    assert out["conf"][-1].dtype == jnp.float32
    assert out["paf"][-1].dtype == jnp.float32


def test_registry_aliases_and_errors():
    assert set(model_names()) >= {"vgg19", "vggtiny", "mobilenet_thin",
                                  "hao28", "vgg", "mobilenet"}
    with pytest.raises(ValueError, match="unknown model"):
        get_model(ModelConfig(name="nope"))


def test_deep_supervision_stages_differ():
    """Later stages must actually refine (different params -> different maps)."""
    cfg = ModelConfig(name="vggtiny", hin=64, win=64, n_stages=2,
                      compute_dtype="float32")
    model = get_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert not np.allclose(np.asarray(out["conf"][0]),
                           np.asarray(out["conf"][1]))


def test_stem_s2d_matches_plain_conv():
    """The space-to-depth stem lowering (common.StemConvRelu) is the SAME
    conv as the plain stride-2 ConvRelu — same params, same output — and
    the pre-transformed (B, H/2, W/2, 12) input layout agrees exactly with
    the plain (B, H, W, 3) one. f32 on CPU: bit-for-bit."""
    from openpose_plus_tpu.models.common import space_to_depth

    mk = lambda s2d: ModelConfig(name="mobilenet_thin", hin=64, win=96,
                                 n_stages=2, compute_dtype="float32",
                                 stem_s2d=s2d)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 96, 3)), jnp.float32)
    m_plain, m_s2d = get_model(mk(False)), get_model(mk(True))
    params = m_plain.init(jax.random.PRNGKey(0), x)
    # identical param trees: one checkpoint serves both lowerings
    params_s2d = m_s2d.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_s2d))
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(
        jnp.shape, params_s2d)
    ref = m_plain.apply(params, x)
    for got in (m_s2d.apply(params, x),
                m_s2d.apply(params, space_to_depth(x)),
                m_s2d.apply(params, space_to_depth(space_to_depth(x)))):
        np.testing.assert_allclose(np.asarray(got["conf"][-1]),
                                   np.asarray(ref["conf"][-1]), rtol=2e-5,
                                   atol=1e-5)


def test_stem_s2d_odd_dims_fall_back():
    cfg = ModelConfig(name="mobilenet_thin", hin=64, win=96, n_stages=2,
                      compute_dtype="float32", stem_s2d=True)
    model = get_model(cfg)
    x = jnp.zeros((1, 63, 95, 3), jnp.float32)  # odd: plain conv path
    params = model.init(jax.random.PRNGKey(0), x)
    model.apply(params, x)  # must trace without shape errors


@pytest.mark.slow
def test_stem_s2d_grads_match_plain_conv():
    """Training through the deep-s2d lowering must produce the SAME
    parameter gradients as the plain lowering (the rearranged kernels are
    linear in the original params, so autodiff scatters grads back
    exactly; f32 CPU)."""
    mk = lambda s2d: ModelConfig(name="mobilenet_thin", hin=64, win=96,
                                 n_stages=2, compute_dtype="float32",
                                 stem_s2d=s2d)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 64, 96, 3)), jnp.float32)
    m_plain, m_s2d = get_model(mk(False)), get_model(mk(True))
    params = m_plain.init(jax.random.PRNGKey(1), x)

    def loss(model, p):
        out = model.apply(p, x)
        return (jnp.sum(out["conf"][-1] ** 2)
                + jnp.sum(out["paf"][-1] ** 2))

    g_plain = jax.grad(lambda p: loss(m_plain, p))(params)
    g_s2d = jax.grad(lambda p: loss(m_s2d, p))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(g_s2d))
    # Same param tree; grads equal up to f32 accumulation noise. The
    # noise is AMPLIFIED by downstream ReLU kinks (a ~1e-6 forward
    # difference can flip a mask bit), so the per-leaf normalized
    # tolerance is 5e-4 — a real rearrangement bug shows up as O(1).
    for path, ga in flat_a:
        gb = flat_b[path]
        scale = max(float(jnp.max(jnp.abs(ga))), 1e-6)
        np.testing.assert_allclose(np.asarray(gb) / scale,
                                   np.asarray(ga) / scale, atol=5e-4,
                                   err_msg=str(path))


@pytest.mark.parametrize("name", ["vggtiny", "hao28", "vgg19"])
def test_vgg_family_s2d_stem_matches_plain(name):
    """The VGG-family conv1 block on the space-to-depth grid (dense
    rearranged kernels + channel-max pool) equals the plain lowering,
    from both the plain and the (B, H/2, W/2, 12) input layouts."""
    from openpose_plus_tpu.models.common import space_to_depth

    mk = lambda s2d: ModelConfig(name=name, hin=64, win=96, n_stages=2,
                                 compute_dtype="float32", stem_s2d=s2d)
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 64, 96, 3)), jnp.float32)
    m_plain, m_s2d = get_model(mk(False)), get_model(mk(True))
    params = m_plain.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params) == jax.tree_util.
            tree_structure(m_s2d.init(jax.random.PRNGKey(0), x)))
    ref = m_plain.apply(params, x)
    for got in (m_s2d.apply(params, x),
                m_s2d.apply(params, space_to_depth(x))):
        np.testing.assert_allclose(np.asarray(got["conf"][-1]),
                                   np.asarray(ref["conf"][-1]), rtol=2e-5,
                                   atol=1e-5)
