"""NeRF-synthetic (Blender) dataset: ``transforms_{split}.json``.

Counterpart of ``projects/nerf/datasets/nerf_blender.py``: background
alpha-compositing, intrinsics from ``camera_angle_x``, GL->CV pose
conversion. Images decode once on the host; training consumes the stacked
arrays device-resident.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from mlinerf_tpu.config import register
from mlinerf_tpu.data.base import Dataset as BaseDataset
from mlinerf_tpu.utils.image_io import load_image

_GL_TO_CV = np.asarray([1, -1, -1, 1], np.float32)


def gl_to_cv(c2w: np.ndarray) -> np.ndarray:
    return c2w * _GL_TO_CV[None, :]


def invert_pose(c2w34: np.ndarray) -> np.ndarray:
    R, t = c2w34[:3, :3], c2w34[:3, 3]
    R_inv = R.T
    return np.concatenate([R_inv, (-R_inv @ t)[:, None]], axis=-1).astype(np.float32)


@register("dataset", "nerf_blender")
class Dataset(BaseDataset):
    images_uint8 = True
    def __init__(self, cfg, is_inference: bool = False, is_test: bool = False):
        super().__init__(cfg, is_inference=is_inference, is_test=is_test)
        cfg_data = cfg.data
        self.root = cfg_data.root
        split = "val" if is_inference else "train"
        self.H, self.W = cfg_data[split].image_size
        meta_fname = os.path.join(self.root, f"transforms_{'val' if is_inference else 'train'}.json")
        with open(meta_fname) as f:
            self.meta = json.load(f)
        self.list = self.meta["frames"]
        subset = cfg_data[split].get("subset")
        if subset:
            idxs = np.linspace(0, len(self.list), subset + 1)[:-1].astype(int)
            self.list = [self.list[i] for i in idxs]
        self.bgcolor = cfg_data.get("bgcolor", 1.0)
        camera_angle_x = float(self.meta["camera_angle_x"])
        # focal set after first image load (raw size known then)
        self._camera_angle_x = camera_angle_x
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}

    def get_image(self, idx: int) -> np.ndarray:
        fpath = os.path.join(self.root, self.list[idx]["file_path"] + ".png")
        return load_image(fpath, size=(self.W, self.H))

    def get_camera(self, idx: int):
        focal = 0.5 * self.W / np.tan(0.5 * self._camera_angle_x)
        intr = np.asarray(
            [[focal, 0, self.W / 2], [0, focal, self.H / 2], [0, 0, 1]], np.float32
        )
        c2w_gl = np.asarray(self.list[idx]["transform_matrix"], np.float32)
        c2w = gl_to_cv(c2w_gl)
        pose = invert_pose(c2w[:3])
        return intr, pose

    def get_full_sample(self, idx: int) -> Dict[str, np.ndarray]:
        if idx in self._cache:
            return self._cache[idx]
        image = self.get_image(idx)
        if image.shape[-1] == 4:
            rgb, a = image[..., :3], image[..., 3:]
            image = rgb * a + self.bgcolor * (1 - a)
        intr, pose = self.get_camera(idx)
        sample = dict(idx=idx, image=image.astype(np.float32), intr=intr, pose=pose)
        self._cache[idx] = sample
        return sample
