"""jax.export engine artifact round-trip."""

import dataclasses

import numpy as np
import pytest

from openpose_plus_tpu import export as E
from openpose_plus_tpu.config import default_config
from openpose_plus_tpu.engine import Engine


def test_export_roundtrip(tmp_path, rng):
    cfg = default_config("vggtiny")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=64, win=64, n_stages=2, compute_dtype="float32"))
    eng = Engine(cfg)
    path = str(tmp_path / "artifact")
    E.save_engine(eng, path, batch_size=2)

    loaded = E.load_engine(path)
    assert loaded.manifest["model"] == "vggtiny"
    images = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    a = eng.infer(images)
    b = loaded.infer(images)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.coords), np.asarray(b.coords),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.score), np.asarray(b.score),
                               atol=1e-5)


@pytest.mark.slow
def test_export_s2d2_layout_roundtrip(tmp_path, rng):
    """Artifacts can bake the space-to-depth-squared input signature; the
    loaded engine then consumes exactly what the host loader emits."""
    from openpose_plus_tpu.models.common import space_to_depth

    import jax.numpy as jnp

    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=64, win=64, n_stages=2, compute_dtype="float32"))
    eng = Engine(cfg)
    path = str(tmp_path / "artifact_s2d2")
    E.save_engine(eng, path, batch_size=2, input_layout="s2d2")
    loaded = E.load_engine(path)
    assert loaded.manifest["input_layout"] == "s2d2"
    images = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    images_q2 = np.asarray(space_to_depth(space_to_depth(
        jnp.asarray(images))))
    a = eng.infer(images)
    b = loaded.infer(images_q2)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.coords), np.asarray(b.coords),
                               atol=1e-5)


def test_export_rejects_unsupported_layout(tmp_path):
    import pytest

    cfg = default_config("vggtiny")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=64, win=64, n_stages=2, compute_dtype="float32"))
    eng = Engine(cfg)
    with pytest.raises(ValueError, match="not supported"):
        E.save_engine(eng, str(tmp_path / "x"), batch_size=1,
                      input_layout="s2d2")  # VGG stems are level-1 only
    cfg_odd = cfg.replace(model=dataclasses.replace(cfg.model, hin=63))
    with pytest.raises(ValueError, match="not supported"):
        E.save_engine(Engine(cfg_odd), str(tmp_path / "y"), batch_size=1,
                      input_layout="s2d")


@pytest.mark.slow
def test_exported_s2d2_artifact_accepts_plain_images(tmp_path, rng):
    """ExportedEngine permutes plain images to the baked layout on the
    host — the deploy-the-artifact workflow never needs layout code."""
    cfg = default_config("mobilenet_thin")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hin=64, win=64, n_stages=2, compute_dtype="float32"))
    eng = Engine(cfg)
    path = str(tmp_path / "a2")
    E.save_engine(eng, path, batch_size=2, input_layout="s2d2")
    loaded = E.load_engine(path)
    images = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    a = eng.infer(images)
    b = loaded.infer(images)  # plain in, permuted internally
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.coords), np.asarray(b.coords),
                               atol=1e-5)
