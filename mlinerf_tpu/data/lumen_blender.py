"""Multi-light Blender / NRHints dataset: point lights via ``pl_pos``.

Counterpart of ``projects/NeuralLumen/data_blender.py``: transforms json with
per-frame ``pl_pos`` point lights (identity light rotation), white-background
alpha compositing, optional GT intrinsic decomposition images (Ref/Sha/Res),
``camera_intrinsics`` or ``camera_angle_x`` intrinsics, NRHints file naming.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from mlinerf_tpu.config import register
from mlinerf_tpu.data.blender import gl_to_cv, invert_pose
from mlinerf_tpu.data.lumen import Dataset as LumenDataset
from mlinerf_tpu.utils.image_io import load_image


@register("dataset", "lumen_blender")
class Dataset(LumenDataset):
    def __init__(self, cfg, is_inference: bool = False, is_test: bool = False):
        self.data_source = cfg.data.get("data_source")
        super().__init__(cfg, is_inference=is_inference, is_test=is_test)
        self.white_background = cfg.data.get("white_background", True)
        split = self.split_name
        self.load_iid = cfg.data[split].get("load_iid", False)

    # ------------------------------------------------------------------

    def _image_path(self, idx: int) -> str:
        frame = self.list[idx]
        if self.data_source == "NRHints":
            fpath = frame["file_path"] + frame.get("file_ext", ".png")
        else:
            fpath = frame["file_path"] + "Img.png"
        return os.path.normpath(os.path.join(self.root, fpath))

    def get_image(self, idx: int) -> np.ndarray:
        img = load_image(self._image_path(idx))
        if self._raw_size is None:
            self._raw_size = (img.shape[1], img.shape[0])
        if img.shape[:2] != (self.H, self.W):
            img = load_image(self._image_path(idx), size=(self.W, self.H))
        return img  # keep alpha; compositing happens in get_full_sample

    def get_iid(self, idx: int) -> Dict[str, np.ndarray]:
        out = {}
        for key in ("Ref", "Sha", "Res"):
            fpath = os.path.normpath(os.path.join(self.root, self.list[idx]["file_path"] + key + ".png"))
            out[key] = load_image(fpath, size=(self.W, self.H))[..., :3]
        return out

    def get_camera(self, idx: int):
        meta = self.meta
        if "camera_intrinsics" in meta:
            cx, cy, fx, fy = meta["camera_intrinsics"][:4]
        else:
            if self._raw_size is None:
                self.get_image(idx)
            raw_W, raw_H = self._raw_size
            camera_angle_x = float(meta["camera_angle_x"])
            fx = fy = 0.5 * raw_W / np.tan(0.5 * camera_angle_x)
            cx, cy = raw_W / 2.0, raw_H / 2.0
        intr = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        if self._raw_size is None:
            self.get_image(idx)
        raw_W, raw_H = self._raw_size
        intr = intr.copy()
        intr[0] *= self.W / raw_W
        intr[1] *= self.H / raw_H
        c2w_gl = np.asarray(self.list[idx]["transform_matrix"], np.float32)
        c2w = self._normalize_c2w(gl_to_cv(c2w_gl))
        return intr, invert_pose(c2w[:3])

    def get_light(self, idx: int) -> np.ndarray:
        """Point light: identity rotation, translation = pl_pos (GL->CV then
        sphere normalization)."""
        c2w_gl = np.eye(4, dtype=np.float32)
        c2w_gl[:3, 3] = np.asarray(self.list[idx]["pl_pos"], np.float32)
        c2w = self._normalize_c2w(gl_to_cv(c2w_gl))
        return invert_pose(c2w[:3])

    # ------------------------------------------------------------------

    def get_full_sample(self, idx: int) -> Dict[str, np.ndarray]:
        if idx in self._cache:
            return self._cache[idx]
        image = self.get_image(idx)
        iid = self.get_iid(idx) if self.load_iid else None
        if image.shape[-1] == 4:
            rgb, a = image[..., :3], image[..., 3:]
            if self.white_background:
                image = rgb * a + (1.0 - a)
                if iid is not None:
                    iid = {k: v * a + (1.0 - a) for k, v in iid.items()}
            else:
                image = rgb
        intr, pose = self.get_camera(idx)
        sample = dict(idx=idx, image=image.astype(np.float32), intr=intr, pose=pose,
                      pose_light=self.get_light(idx))
        if iid is not None:
            sample.update(iid)
        self._cache[idx] = sample
        return sample

    def _pseudo_label_keys(self, idx: int):
        # Blender-style data: each frame is its own camera; 'unpair' labels
        # key by frame index with light bucket "0" (reference
        # data_blender.py:165-171).
        return str(idx), "0"
