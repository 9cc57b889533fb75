"""Host-side image IO helpers (PIL + numpy; no torch)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def to_uint8(image: np.ndarray, from_range: Tuple[float, float] = (0.0, 1.0)) -> np.ndarray:
    """[H,W,C] or [C,H,W] float -> [H,W,C] uint8, rescaled from from_range."""
    img = np.asarray(image, np.float32)
    if img.ndim == 3 and img.shape[0] in (1, 3, 4) and img.shape[-1] not in (1, 3, 4):
        img = np.moveaxis(img, 0, -1)
    lo, hi = from_range
    img = (img - lo) / max(hi - lo, 1e-12)
    img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img


def save_image(path: str, image: np.ndarray, from_range: Tuple[float, float] = (0.0, 1.0)):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(to_uint8(image, from_range)).save(path)


def load_image(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load as float32 [H,W,C] in [0,1]; size=(W,H) resizes."""
    from PIL import Image

    img = Image.open(path)
    img.load()
    if size is not None:
        img = img.resize(size)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def write_video(path: str, frames, fps: int = 30):
    """Write an mp4 from a list of [H,W,3] uint8 frames via OpenCV."""
    import cv2 as cv

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    h, w = frames[0].shape[:2]
    writer = cv.VideoWriter(path, cv.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for frame in frames:
        writer.write(cv.cvtColor(frame, cv.COLOR_RGB2BGR))
    writer.release()


def create_collage(frame_imgs, padding: int = 5) -> np.ndarray:
    """Tile images (all same size, [H,W,3] uint8) into a near-square collage."""
    img_height, img_width, _ = frame_imgs[0].shape
    rows = int(np.sqrt(len(frame_imgs)))
    cols = int(np.ceil(len(frame_imgs) / rows))
    collage = np.ones((img_height * rows, img_width * cols + padding * (cols - 1), 3), np.uint8) * 255
    for idx, img in enumerate(frame_imgs):
        r, c = idx // cols, idx % cols
        y0, x0 = r * img_height, c * (img_width + padding)
        collage[y0 : y0 + img_height, x0 : x0 + img_width] = img
    return collage


def annotate(img: np.ndarray, text: str) -> np.ndarray:
    """Append a white strip with a label below an image (uint8 [H,W,3])."""
    try:
        import cv2 as cv
    except ImportError:
        return img
    strip_h = max(img.shape[0] // 10, 16)
    strip = np.ones((strip_h, img.shape[1], 3), np.uint8) * 255
    out = np.vstack([img, strip])
    cv.putText(out, text, (10, out.shape[0] - 6), cv.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1, cv.LINE_AA)
    return out
