"""Calibrated int8 inference mode (the reference's TensorRT int8 analogue).

Covers: weight/activation quantization math, the calibration pass (calib
collection of running max|activation| scales), checkpoint compatibility
(one float param tree serves every compute mode), and end-to-end decode
agreement between the int8 and bf16 engines on a synthetic scene.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maputil
from openpose_plus_tpu.config import default_config
from openpose_plus_tpu.engine import Engine
from openpose_plus_tpu.models import common


def test_weight_quantization_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 32, 64)), jnp.float32)
    qw, wmax = common.quantize_weight(k)
    assert qw.dtype == jnp.int8
    deq = np.asarray(qw, np.float32) * np.asarray(wmax) / 127.0
    # per-channel symmetric: error bounded by half a quantization step
    step = np.asarray(wmax) / 127.0
    assert np.all(np.abs(deq - np.asarray(k)) <= 0.5 * step + 1e-7)


def test_act_quantization_clips_and_scales():
    x = jnp.asarray([-5.0, -1.0, 0.0, 0.5, 2.0], jnp.float32)
    q = common.quantize_act(x, jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(q), [-127, -127, 0, 64, 127])


@pytest.mark.slow
def test_calibration_records_scales():
    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=96, win=112, compute_dtype="int8"))
    eng = Engine(cfg, seed=0)
    assert "calib" in eng.params
    leaves = jax.tree.leaves(eng.params["calib"])
    assert leaves and all(float(v) == 0.0 for v in leaves)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 96, 112, 3), dtype=np.uint8)
    eng.calibrate(images)
    leaves = jax.tree.leaves(eng.params["calib"])
    assert all(float(v) > 0.0 for v in leaves), "every conv saw activations"
    # scales are running maxima: further calibration never shrinks them
    before = [float(v) for v in leaves]
    eng.calibrate((images * 0).astype(np.uint8))
    after = [float(v) for v in jax.tree.leaves(eng.params["calib"])]
    assert all(a >= b for a, b in zip(after, before))
    # re-calibrating on the same data is a fixed point
    eng.calibrate(images)
    again = [float(v) for v in jax.tree.leaves(eng.params["calib"])]
    assert again == after


@pytest.mark.slow
def test_int8_engine_matches_bf16_on_scene():
    """End-to-end: train-free engines share float params; the int8 decode
    must find the same humans as bf16 with close coordinates (quantization
    noise ~1/127 on maps; peak positions are argmax-stable)."""
    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, hin=96, win=112))
    bf = Engine(cfg, seed=3)
    cfg8 = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="int8"))
    q8 = Engine(cfg8, seed=3)
    q8.params = {**q8.params, "params": bf.params["params"]}

    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (2, 96, 112, 3), dtype=np.uint8)
    q8.calibrate(images)

    conf_b, paf_b = bf.forward(images)
    conf_q, paf_q = q8.forward(images)
    assert conf_q.shape == conf_b.shape and paf_q.shape == paf_b.shape
    # random-weight maps are near-arbitrary; require correlation, not
    # equality — int8 must track the float function, not mimic its noise
    cb, cq = np.asarray(conf_b).ravel(), np.asarray(conf_q).ravel()
    denom = np.linalg.norm(cb) * np.linalg.norm(cq)
    assert denom > 0 and float(cb @ cq) / denom > 0.98


@pytest.mark.slow
def test_partially_calibrated_tree_recalibrates():
    """A calib tree with ANY zero scale must not count as calibrated (a
    zero-scale layer would silently saturate); infer() re-calibrates."""
    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=96, win=112, compute_dtype="int8"))
    eng = Engine(cfg, seed=0)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (1, 96, 112, 3), dtype=np.uint8)
    eng.calibrate(images)
    # zero out one layer's scale and drop the cached flag
    calib = jax.device_get(eng.params["calib"])
    leaf_path = next(iter(jax.tree_util.tree_leaves_with_path(calib)))[0]
    sub = calib
    for p in leaf_path[:-1]:
        sub = sub[p.key]
    sub[leaf_path[-1].key] = jnp.zeros((), jnp.float32)
    eng.params = {**eng.params, "calib": calib}
    eng._calibrated = False
    assert eng._needs_calibration()
    out = eng.infer(images)
    assert bool(np.isfinite(np.asarray(out.score)).all())
    assert all(float(v) > 0 for v in jax.tree.leaves(eng.params["calib"]))


def test_int8_implicit_calibration_on_first_infer():
    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=96, win=112, compute_dtype="int8"))
    eng = Engine(cfg, seed=0)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (1, 96, 112, 3), dtype=np.uint8)
    out = eng.infer(images)  # must auto-calibrate, not produce garbage
    assert bool(np.isfinite(np.asarray(out.score)).all())
    assert all(float(v) > 0 for v in jax.tree.leaves(eng.params["calib"]))


def test_int8_decode_agrees_on_synthetic_maps():
    """Decode stage is float regardless of engine mode — identical maps in,
    identical skeletons out (sanity that the mode only touches the CNN)."""
    people = [maputil.standing_person(10, 8)]
    conf, paf = maputil.make_maps(people, 46, 54)
    from openpose_plus_tpu.config import PostprocConfig
    from openpose_plus_tpu.postproc import build_decoder

    out = build_decoder(PostprocConfig())(conf[None], paf[None])
    assert int(out.num_humans[0]) == 1


def test_train_rejects_int8():
    import pytest

    from openpose_plus_tpu.train import create_train_state

    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="int8"))
    with pytest.raises(ValueError, match="int8"):
        create_train_state(cfg, jax.random.PRNGKey(0))


def test_int8_keeps_quantized_conv1_with_stem_s2d_default():
    """stem_s2d (default True) must not reroute int8's conv1 away from
    the quantized ConvRelu path: the calib tree keeps conv1/act_scale and
    old int8 checkpoints stay structurally loadable."""
    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=96, win=112, compute_dtype="int8"))
    assert cfg.model.stem_s2d
    eng = Engine(cfg, seed=0)
    assert "conv1" in eng.params["calib"]
