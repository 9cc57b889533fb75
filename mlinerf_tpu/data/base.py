"""Dataset base: threaded preloading + device-resident array export.

The reference feeds training through a torch DataLoader with per-item host
``randperm`` ray sampling (projects/nerf/datasets/base.py, neuralangelo/
data.py:84-92). The TPU-native redesign exports the WHOLE training split as
stacked arrays (``as_arrays``) that live in HBM; image/ray sampling then
happens on-device inside the jitted train step (trainers/base.py
``sample_batch``). ``preload_threading`` is kept for fast host-side decode.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, List, Optional

import numpy as np


class Dataset:
    """Base dataset. Subclasses populate ``self.list`` (frame metadata) and
    implement get_image/get_camera (and get_light for multi-light data)."""

    # File-backed datasets flip this: images come from 8-bit sources, so the
    # device-resident copy stores uint8 (4x less HBM; decoded to fp32 by the
    # on-device pixel gather in trainers.base.sample_batch).
    images_uint8 = False

    def __init__(self, cfg, is_inference: bool = False, is_test: bool = False):
        self.cfg = cfg
        self.split = "test" if is_test else ("val" if is_inference else "train")
        self.is_inference = is_inference

    def __len__(self):
        return len(self.list)

    # ------------------------------------------------------------------

    def preload_threading(self, load_fn: Callable, num_workers: int, data_str: str = "images"):
        """Load every sample with a worker-thread pool (host-side decode)."""
        num_workers = max(int(num_workers), 1)
        n = len(self)
        results: List[Any] = [None] * n
        q: "queue.Queue[int]" = queue.Queue()
        for i in range(n):
            q.put(i)

        def worker():
            while True:
                try:
                    idx = q.get_nowait()
                except queue.Empty:
                    return
                results[idx] = load_fn(idx)
                q.task_done()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
        for t in threads:
            t.start()
        q.join()
        return results

    # ------------------------------------------------------------------

    def get_full_sample(self, idx: int) -> Dict[str, np.ndarray]:
        """Eval-style sample: full image + camera (+light), regardless of split."""
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.get_full_sample(idx)

    def as_arrays(self) -> Dict[str, np.ndarray]:
        """Stack the whole split into arrays for device-resident training.

        Returns at least: images [N,H,W,3] (uint8 or float32), pose [N,3,4],
        intr [N,3,3]; multi-light datasets add pose_light [N,3,4] and
        pseudo-label maps.
        """
        samples = [self.get_full_sample(i) for i in range(len(self))]
        out: Dict[str, np.ndarray] = {}
        keys = samples[0].keys()
        for key in keys:
            if key == "idx":
                continue
            vals = [np.asarray(s[key]) for s in samples]
            name = "images" if key == "image" else key
            stacked = np.stack(vals)
            if name == "images" and self.images_uint8 and stacked.dtype != np.uint8:
                stacked = np.clip(stacked * 255.0 + 0.5, 0, 255).astype(np.uint8)
            out[name] = stacked
        return out
