"""Serialized engine artifacts via jax.export.

The reference freezes the TF graph and converts to .uff for its C++
TensorRT runtime (scripts/export-uff.py + src/uff-runner.cpp [MED; empty
mount — SURVEY.md §2 "UFF export"]). The TPU-native analogue: the whole
end-to-end engine (uint8 preprocess -> CNN -> on-device grouping) is one
jit program, exported as a self-contained StableHLO artifact that reloads
and runs without the model-building Python code — weights baked in, like
a frozen graph.
"""

from __future__ import annotations

import json
import os
import jax
import jax.numpy as jnp
import numpy as np

from openpose_plus_tpu.engine import Engine, _infer_impl
from openpose_plus_tpu.postproc import HumanBatch


_MANIFEST = "manifest.json"
_ARTIFACT = "engine.stablehlo.bin"


def save_engine(engine: Engine, path: str, batch_size: int = 1,
                input_layout: str = "plain") -> None:
    """Export the engine for a fixed batch size to `path/` (dir).

    input_layout: "plain" (B,hin,win,3), "s2d" (B,hin/2,win/2,12) or
    "s2d2" (B,hin/4,win/4,48) — the space-to-depth layouts the host
    loader emits (Engine.compile docstring); baked into the artifact's
    input signature and recorded in the manifest."""
    from jax import export as jexport

    if engine._needs_calibration():
        raise ValueError(
            "int8 engine exported before calibration: the activation "
            "scales would be frozen at zero. Call Engine.calibrate() on "
            "representative images first.")
    from openpose_plus_tpu.engine import check_input_layout

    m = engine.config.model
    shape = m.input_shape(batch_size, check_input_layout(m, input_layout))
    spec = jax.ShapeDtypeStruct(shape, jnp.uint8)

    # Close over the params so the artifact is self-contained (frozen
    # graph semantics — no Python model code needed at load time). The
    # result is flattened to a plain dict: custom pytree types are not
    # serializable by jax.export without registration.
    def infer(images):
        out = _infer_impl(engine.params, images, model=engine.model,
                          postproc_cfg=engine.config.postproc)
        return {"coords": out.coords, "part_scores": out.part_scores,
                "part_valid": out.part_valid, "score": out.score,
                "n_parts": out.n_parts, "valid": out.valid}

    exported = jexport.export(jax.jit(infer))(spec)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, _MANIFEST), "w") as f:
        import dataclasses as _dc

        json.dump({
            "model": m.name,
            "batch_size": batch_size,
            "hin": m.hin,
            "win": m.win,
            "input_layout": input_layout,
            "format": "jax.export/StableHLO",
            "platforms": list(exported.platforms),
            # full config so ExportedEngine.config reports what the
            # artifact was actually built with (stride, dtype, postproc
            # fidelity settings), not defaults
            "model_config": _dc.asdict(m),
            "postproc_config": _dc.asdict(engine.config.postproc),
        }, f, indent=2)


class ExportedEngine:
    """Loaded artifact: infer(images u8) -> HumanBatch.

    Duck-types the slice of Engine the CLI apps use (`infer`, `config`), so
    `pose infer --engine-dir ...` can run a frozen artifact with no model
    code — the reference's deploy-the-.uff workflow. Accepts plain
    (B, hin, win, 3) images regardless of the artifact's baked
    input_layout — the host-side space-to-depth permute is applied here
    when the signature needs it — or the already-permuted layout directly.
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        with open(os.path.join(path, _ARTIFACT), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        self._call = jax.jit(self._exported.call)

    @property
    def config(self):
        import dataclasses

        from openpose_plus_tpu.config import default_config

        cfg = default_config(self.manifest["model"])
        mc = dataclasses.replace(cfg.model, hin=self.manifest["hin"],
                                 win=self.manifest["win"])
        if "model_config" in self.manifest:  # full fidelity (newer artifacts)
            mc = dataclasses.replace(mc, **self.manifest["model_config"])
            cfg = cfg.replace(postproc=dataclasses.replace(
                cfg.postproc, **self.manifest["postproc_config"]))
        return cfg.replace(model=mc)

    @property
    def batch_size(self) -> int:
        return int(self.manifest["batch_size"])

    def infer(self, images: np.ndarray | jax.Array) -> HumanBatch:
        layout = self.manifest.get("input_layout", "plain")
        if layout != "plain" and images.shape[-1] == 3:
            from openpose_plus_tpu import native

            pack = native.s2d2_u8 if layout == "s2d2" else native.s2d_u8
            images = np.stack([pack(np.asarray(f, np.uint8))
                               for f in images])
        out = self._call(jnp.asarray(images))
        return HumanBatch(**out)


def load_engine(path: str) -> ExportedEngine:
    return ExportedEngine(path)
