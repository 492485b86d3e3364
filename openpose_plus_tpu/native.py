"""ctypes binding to the native host runtime (libpose_host.so).

The native layer owns the host-side input path — JPEG/PNG decode, bilinear
letterbox, multithreaded batch assembly behind bounded channels, and a C++
scope tracer — replacing the reference's C++ input/stream/tracer stack
(src/input.cpp, src/stream_detector.cpp, src/tracer.h [MED; empty
reference mount — SURVEY.md §2]). Falls back cleanly (is_available()) when
the library has not been built; `make -C native` builds it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libpose_host.so")

_lib: Optional[ctypes.CDLL] = None


def _load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ph_stream_create.restype = ctypes.c_void_p
    lib.ph_stream_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ph_stream_next.restype = ctypes.c_int
    lib.ph_stream_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.ph_stream_destroy.argtypes = [ctypes.c_void_p]
    lib.ph_load_image.restype = ctypes.c_int
    lib.ph_load_image.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_void_p]
    lib.ph_letterbox.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
                                 ctypes.c_void_p, ctypes.c_void_p]
    lib.ph_tracer_report.restype = ctypes.c_char_p
    if hasattr(lib, "ph_stream_create2"):  # stale prebuilt .so lacks v2
        lib.ph_stream_create2.restype = ctypes.c_void_p
        lib.ph_stream_create2.argtypes = (
            lib.ph_stream_create.argtypes + [ctypes.c_int])
        lib.ph_s2d_u8.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_void_p]
        lib.ph_s2d2_u8.argtypes = lib.ph_s2d_u8.argtypes
        if hasattr(lib, "ph_stream_level"):
            lib.ph_stream_level.restype = ctypes.c_int
            lib.ph_stream_level.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def s2d_u8(image: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H/2, W/2, 12) space-to-depth layout (the
    engine's fast input format; models/common.py space_to_depth). Uses the
    native permutation when available, numpy otherwise."""
    h, w, _ = image.shape
    if h % 2 or w % 2:
        # fail loudly on BOTH paths (the C++ loop would silently drop the
        # trailing row/column; the numpy reshape would raise differently)
        raise ValueError(f"space-to-depth needs even dims, got {h}x{w}")
    lib = _load()
    if lib is not None and hasattr(lib, "ph_s2d_u8"):
        image = np.ascontiguousarray(image, np.uint8)
        out = np.empty((h // 2, w // 2, 12), np.uint8)
        lib.ph_s2d_u8(image.ctypes.data_as(ctypes.c_void_p), h, w,
                      out.ctypes.data_as(ctypes.c_void_p))
        return out
    x = image.reshape(h // 2, 2, w // 2, 2, 3)
    return np.ascontiguousarray(x.transpose(0, 2, 1, 3, 4)).reshape(
        h // 2, w // 2, 12)


def s2d2_u8(image: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H/4, W/4, 48): space-to-depth applied twice —
    the engine's fastest input layout (deep-s2d stem; models/common.py)."""
    h, w, _ = image.shape
    if h % 4 or w % 4:
        raise ValueError(
            f"space-to-depth squared needs dims % 4 == 0, got {h}x{w}")
    lib = _load()
    if lib is not None and hasattr(lib, "ph_s2d2_u8"):
        image = np.ascontiguousarray(image, np.uint8)
        out = np.empty((h // 4, w // 4, 48), np.uint8)
        lib.ph_s2d2_u8(image.ctypes.data_as(ctypes.c_void_p), h, w,
                       out.ctypes.data_as(ctypes.c_void_p))
        return out

    def once(a):  # generic-channel numpy space-to-depth
        hh, ww, c = a.shape
        a = a.reshape(hh // 2, 2, ww // 2, 2, c).transpose(0, 2, 1, 3, 4)
        return a.reshape(hh // 2, ww // 2, 4 * c)

    return np.ascontiguousarray(once(once(image)))


def d2s_u8(image: np.ndarray) -> np.ndarray:
    """Inverse of s2d_u8 / s2d2_u8 by channel count (3: identity, 12: one
    level, 48: two levels) -> plain (H, W, 3). Host-side rendering helper
    (numpy; not a hot path)."""
    def once(a):
        hh, ww, c4 = a.shape
        a = a.reshape(hh, ww, 2, 2, c4 // 4).transpose(0, 2, 1, 3, 4)
        return a.reshape(2 * hh, 2 * ww, c4 // 4)

    if image.shape[-1] == 48:
        image = once(image)
    if image.shape[-1] == 12:
        image = once(image)
    if image.shape[-1] != 3:
        raise ValueError(f"unexpected channel count {image.shape}")
    return np.ascontiguousarray(image)


def is_available() -> bool:
    return _load() is not None


def load_image(path: str, hin: int, win: int
               ) -> Optional[tuple[np.ndarray, float, tuple[float, float]]]:
    """Native decode + letterbox: (image (hin,win,3) u8, scale, pads)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((hin, win, 3), np.uint8)
    scale = ctypes.c_float()
    pads = (ctypes.c_float * 2)()
    ok = lib.ph_load_image(path.encode(), hin, win,
                           out.ctypes.data_as(ctypes.c_void_p),
                           ctypes.byref(scale), pads)
    if not ok:
        return None
    return out, float(scale.value), (float(pads[0]), float(pads[1]))


def letterbox(rgb: np.ndarray, hin: int, win: int
              ) -> tuple[np.ndarray, float, tuple[float, float]]:
    """Native letterbox of an in-memory RGB frame."""
    lib = _load()
    assert lib is not None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    out = np.empty((hin, win, 3), np.uint8)
    scale = ctypes.c_float()
    pads = (ctypes.c_float * 2)()
    lib.ph_letterbox(rgb.ctypes.data_as(ctypes.c_void_p), rgb.shape[0],
                     rgb.shape[1], hin, win,
                     out.ctypes.data_as(ctypes.c_void_p),
                     ctypes.byref(scale), pads)
    return out, float(scale.value), (float(pads[0]), float(pads[1]))


def tracer_report() -> str:
    lib = _load()
    return lib.ph_tracer_report().decode() if lib else ""


class NativeStreamLoader:
    """Multithreaded decode -> letterbox -> batch stream (C++ backed).

    Yields dict batches: images (B,hin,win,3) u8 — or (B,hin/2,win/2,12)
    with s2d=True (the engine's space-to-depth input layout, emitted by
    the C++ workers for free) — scales (B,), pads (B,2), indices (B,);
    the last batch may be short.
    """

    def __init__(self, paths: Sequence[str], hin: int, win: int,
                 batch: int = 8, workers: int = 8, queue_capacity: int = 4,
                 loop: bool = False, s2d: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libpose_host.so unavailable; run `make -C native`")
        self._lib = lib
        self.hin, self.win, self.batch = hin, win, batch
        # s2d level: 0 plain, 1 (hin/2,win/2,12), 2 (hin/4,win/4,48).
        # The C++ loader demotes the requested level when the geometry
        # disallows it; the EFFECTIVE level is read back from the handle
        # (single source of truth for the buffer-shape contract).
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        if hasattr(lib, "ph_stream_create2") and hasattr(lib,
                                                         "ph_stream_level"):
            self._handle = lib.ph_stream_create2(
                arr, len(paths), hin, win, batch, workers, queue_capacity,
                int(loop), int(s2d))
            self.s2d = int(lib.ph_stream_level(self._handle))
        else:  # stale prebuilt .so: v1 API, plain layout only
            self._handle = lib.ph_stream_create(
                arr, len(paths), hin, win, batch, workers, queue_capacity,
                int(loop))
            self.s2d = 0

    def __iter__(self) -> Iterator[dict]:
        shape = {0: (self.batch, self.hin, self.win, 3),
                 1: (self.batch, self.hin // 2, self.win // 2, 12),
                 2: (self.batch, self.hin // 4, self.win // 4, 48),
                 }[self.s2d]
        while True:
            images = np.empty(shape, np.uint8)
            scales = np.empty((self.batch,), np.float32)
            pads = np.empty((self.batch, 2), np.float32)
            indices = np.empty((self.batch,), np.int32)
            n = self._lib.ph_stream_next(
                self._handle,
                images.ctypes.data_as(ctypes.c_void_p),
                scales.ctypes.data_as(ctypes.c_void_p),
                pads.ctypes.data_as(ctypes.c_void_p),
                indices.ctypes.data_as(ctypes.c_void_p))
            if n == 0:
                return
            yield {"images": images[:n], "scales": scales[:n],
                   "pads": pads[:n], "indices": indices[:n]}

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.ph_stream_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
