"""Host input pipeline: decode + augment workers feeding the device.

Replaces the reference's tf.data.Dataset.from_generator + py_func map
(train.py [HIGH; empty mount — SURVEY.md §2 "tf.data pipeline"]). Heavy GT
synthesis happens ON DEVICE (data/targets.py, inside the jit'd step), so
host workers only decode JPEGs and apply one affine warp per sample; a
bounded queue of ready batches gives back-pressure, and jax.device_put
overlaps H2D with compute (double-buffering via the queue depth).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from openpose_plus_tpu.config import Config
from openpose_plus_tpu.data import augment as A
from openpose_plus_tpu.data.coco import CocoPoseDataset, pad_keypoints

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _load_image(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class TrainPipeline:
    """Infinite shuffled batch stream: {'images', 'keypoints', 'mask'}.

    images:    (B, hin, win, 3) uint8
    keypoints: (B, max_people, 18, 3) float32, network-input pixel coords
    mask:      (B, hout, wout, 1) float32 loss mask
    """

    def __init__(self, dataset: CocoPoseDataset, config: Config,
                 seed: int = 0, num_workers: Optional[int] = None,
                 max_people: int = 32, with_replacement: bool = False):
        self.ds = dataset
        self.cfg = config
        self.max_people = max_people
        self.seed = seed
        self.num_workers = num_workers or config.data.num_workers
        self.with_replacement = with_replacement
        self._q: queue.Queue = queue.Queue(maxsize=config.data.prefetch)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._started = False
        # shared shuffled-epoch cursor (reference shuffle+repeat semantics:
        # every sample seen once per epoch, new permutation each epoch)
        self._epoch_lock = threading.Lock()
        self._epoch_rng = np.random.default_rng(seed)
        self._perm = self._epoch_rng.permutation(len(dataset))
        self._cursor = 0

    def _draw_indices(self, n: int, rng: np.random.Generator) -> np.ndarray:
        if self.with_replacement:
            return rng.integers(0, len(self.ds), size=n)
        out = np.empty(n, np.int64)
        with self._epoch_lock:
            for i in range(n):
                if self._cursor >= len(self._perm):
                    self._perm = self._epoch_rng.permutation(len(self.ds))
                    self._cursor = 0
                out[i] = self._perm[self._cursor]
                self._cursor += 1
        return out

    # --------------------------------------------------------- workers ---

    def _worker(self, wid: int) -> None:
        rng = np.random.default_rng(self.seed * 1000 + wid)
        m = self.cfg.model
        b = self.cfg.train.batch_size
        while not self._stop.is_set():
            idx = self._draw_indices(b, rng)
            images, kps, masks = [], [], []
            for i in idx:
                s = self.ds[int(i)]
                img = _load_image(s.image_path)
                aug = A.augment_sample(img, s.keypoints, s.ignore_mask(),
                                       self.cfg.data, m.hin, m.win, rng)
                images.append(aug.image)
                kps.append(pad_keypoints(aug.keypoints, self.max_people))
                small = cv2.resize(aug.mask, (m.wout, m.hout),
                                   interpolation=cv2.INTER_AREA)
                masks.append((small > 0.5).astype(np.float32)[..., None])
            batch = {
                "images": np.stack(images),
                "keypoints": np.stack(kps),
                "mask": np.stack(masks),
            }
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def start(self) -> None:
        if self._started:
            return
        self._started = True
        for w in range(self.num_workers):
            t = threading.Thread(target=self._worker, args=(w,), daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()

    def __iter__(self) -> Iterator[dict]:
        self.start()
        while True:
            yield self._q.get()
