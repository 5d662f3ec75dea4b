"""Host-side prefetching camera/image loader.

Replaces the reference's torch DataLoader worker processes
(train.py:55, scene/__init__.py:31-67) with a thread-pool prefetcher: image
decode + background compositing + resize happen on host threads while the
TPU runs the previous step, and arrays arrive ready for jax.device_put.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

from gaussianavatars_tpu.data.cameras import Camera


_CACHE_LOCK = threading.Lock()
_IMAGE_CACHE: dict = {}     # (path, w, h, bg-bytes) -> [3,H,W] f32
_CACHE_BYTES = [0]
_CACHE_BUDGET = int(float(__import__("os").environ.get(
    "GA_IMAGE_CACHE_GB", "4")) * (1 << 30))


def load_camera_image(cam: Camera, resolution_arg: int = -1,
                      resolution_scale: float = 1.0) -> np.ndarray:
    """Decode + composite + resize one view. Returns [3, H, W] float32.

    Mirrors reference scene/__init__.py:38-63: RGBA images composite onto
    the camera background; resize follows the 1600px auto-cap policy.
    Decoded views are cached in host RAM (the reference keeps every
    original_image resident, scene/cameras.py) under a byte budget
    (GA_IMAGE_CACHE_GB, default 4) with whole-cache reset on overflow —
    epochs beyond the first stop paying PNG decode entirely when the
    dataset fits.
    """
    w, h = cam.resolution(resolution_arg, resolution_scale)
    key = (cam.image_path, w, h, cam.bg.tobytes())
    with _CACHE_LOCK:
        hit = _IMAGE_CACHE.get(key)
    if hit is not None:
        return hit

    # native path: libpng/libjpeg decode + CHW compositing with the GIL
    # released (gaussianavatars_tpu/native) — loader threads decode in
    # true parallel. PIL handles resizes (rare: the auto-cap policy) and
    # exotic formats.
    out = None
    if (w, h) == (cam.width, cam.height):
        from gaussianavatars_tpu import native

        raw = native.decode(cam.image_path)
        if raw is not None and raw.shape[:2] == (h, w):
            out = native.to_chw_f32(raw, np.asarray(cam.bg, np.float32))

    if out is None:
        from PIL import Image, ImageFile

        ImageFile.LOAD_TRUNCATED_IMAGES = True

        with Image.open(cam.image_path) as im:
            if im.size != (w, h):
                im = im.resize((w, h))
            arr = np.asarray(im).astype(np.float32) / 255.0

        if arr.ndim == 2:
            arr = arr[..., None].repeat(3, axis=-1)
        if arr.shape[-1] == 4:
            rgb, alpha = arr[..., :3], arr[..., 3:4]
            arr = rgb * alpha + cam.bg[None, None, :] * (1.0 - alpha)
        out = np.transpose(arr[..., :3], (2, 0, 1)).copy()
    out.setflags(write=False)
    with _CACHE_LOCK:
        if _CACHE_BYTES[0] + out.nbytes > _CACHE_BUDGET:
            _IMAGE_CACHE.clear()
            _CACHE_BYTES[0] = 0
        if out.nbytes <= _CACHE_BUDGET:
            _IMAGE_CACHE[key] = out
            _CACHE_BYTES[0] += out.nbytes
    return out


class CameraLoader:
    """Iterates (camera, gt_image) pairs forever with background prefetch.

    Decoding is parallel but DELIVERY is strictly the shuffled epoch order:
    each draw is tagged with a sequence number and the consumer reorders,
    so epoch boundaries are deterministic (every camera exactly once per
    epoch, reproducible across runs) regardless of thread scheduling.
    """

    def __init__(self, cameras: list[Camera], resolution_arg: int = -1,
                 shuffle: bool = True, prefetch: int = 4,
                 num_threads: int = 4, seed: int = 0,
                 loop: bool = True):
        assert len(cameras) > 0
        self.cameras = cameras
        self.resolution_arg = resolution_arg
        self.shuffle = shuffle
        self.loop = loop
        self.rng = random.Random(seed)
        self._queue: queue.Queue = queue.Queue(maxsize=max(prefetch,
                                                           num_threads))
        self._stop = threading.Event()
        self._threads = []
        self._order_lock = threading.Lock()
        self._order: list[int] = []
        self._epoch_pos = 0
        self._served = 0
        self._next_seq = 0
        self._reorder: dict = {}
        for _ in range(num_threads):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _next_index(self) -> Optional[tuple[int, int]]:
        with self._order_lock:
            if self._epoch_pos >= len(self._order):
                if not self.loop and self._served >= len(self.cameras):
                    return None
                self._order = list(range(len(self.cameras)))
                if self.shuffle:
                    self.rng.shuffle(self._order)
                self._epoch_pos = 0
            idx = self._order[self._epoch_pos]
            seq = self._served
            self._epoch_pos += 1
            self._served += 1
            return seq, idx

    def _worker(self):
        while not self._stop.is_set():
            drawn = self._next_index()
            if drawn is None:
                return
            seq, idx = drawn
            cam = self.cameras[idx]
            try:
                img = load_camera_image(cam, self.resolution_arg)
                item = (seq, cam, img)
            except Exception as exc:  # surface loader errors to the consumer
                item = (seq, cam, exc)
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[tuple[Camera, np.ndarray]]:
        return self

    def __next__(self):
        # release items strictly in draw order
        while self._next_seq not in self._reorder:
            seq, cam, img = self._queue.get()
            self._reorder[seq] = (cam, img)
        cam, img = self._reorder.pop(self._next_seq)
        self._next_seq += 1
        if isinstance(img, Exception):
            raise img
        return cam, img

    def stop(self):
        self._stop.set()


def iterate_once(cameras: list[Camera], resolution_arg: int = -1):
    """Simple sequential iteration (eval sweeps)."""
    for cam in cameras:
        yield cam, load_camera_image(cam, resolution_arg)
