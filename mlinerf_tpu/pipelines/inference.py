"""Inference suite: image dumps, tag-selected renders, relighting videos.

Counterpart of the eval engine in ``projects/nerf/trainers/base.py``
(``test_save`` :176, ``test_images`` :218, ``test_video`` :265) — host-side
orchestration over the trainer's chunked jitted renderer.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from mlinerf_tpu.utils import camera
from mlinerf_tpu.utils.image_io import annotate, create_collage, save_image, to_uint8, write_video


def _sample_to_batch(sample) -> Dict[str, np.ndarray]:
    data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
    data["idx"] = np.asarray([sample.get("idx", 0)])
    return data


def test_save(trainer, dataset, output_dir: str, image_size=None, show_pbar: bool = False):
    """Render every sample and dump every ``*_map`` output as PNG.

    Files are named ``{idx}_{key}.png`` (reference: trainers/base.py:199-213).
    """
    image_size = image_size or trainer.cfg.data.val.image_size
    os.makedirs(output_dir, exist_ok=True)
    for i in range(len(dataset)):
        sample = dataset.get_full_sample(i)
        data = _sample_to_batch(sample)
        maps = trainer.inference_outputs(data, image_size)
        idx = sample.get("idx", i)
        for key, value in maps.items():
            if not key.endswith("_map"):
                continue
            from_range = (-1, 1) if "normal" in key else (0, 1)
            save_image(os.path.join(output_dir, f"{idx}_{key}.png"), value[0], from_range=from_range)
        if "image" in sample:
            save_image(os.path.join(output_dir, f"{idx}_gt.png"), sample["image"])
        if show_pbar:
            print(f"[test_save] {i + 1}/{len(dataset)}")


def test_images(trainer, dataset, output_dir: str, setting_list: Sequence[str] = ("c25l10",),
                image_size=None, show_pbar: bool = False):
    """Render the frames matching camera/light tags like 'c25l10' (ReNe)."""
    image_size = image_size or trainer.cfg.data.val.image_size
    os.makedirs(output_dir, exist_ok=True)
    for setting in setting_list:
        idx = dataset.find_idx_cam_light(setting)
        if idx is None:
            print(f"[test_images] tag {setting} not found")
            continue
        sample = dataset.get_full_sample(idx)
        data = _sample_to_batch(sample)
        maps = trainer.inference_outputs(data, image_size)
        for key, value in maps.items():
            if not key.endswith("_map"):
                continue
            from_range = (-1, 1) if "normal" in key else (0, 1)
            save_image(os.path.join(output_dir, f"{setting}_{key}.png"), value[0], from_range=from_range)
        if "image" in sample:
            save_image(os.path.join(output_dir, f"{setting}_gt.png"), sample["image"])


def test_video(trainer, dataset, idx1: int, idx2: int, output_dir: str,
               video_content: Sequence[str] = ("rgb", "gt"), num_frames: int = 60,
               image_size=None, show_pbar: bool = False, fps: int = 30):
    """Novel-view + novel-light video: slerp both the camera pose and the
    light pose between two dataset frames, render a collage per frame, and
    write a mirrored mp4 (reference: trainers/base.py:265-346)."""
    image_size = image_size or trainer.cfg.data.val.image_size
    os.makedirs(output_dir, exist_ok=True)
    sample1 = dataset.get_full_sample(int(idx1))
    sample2 = dataset.get_full_sample(int(idx2))
    has_light = "pose_light" in sample1
    frames = []
    for f in range(num_frames):
        # sin-eased interpolation ratio in [0, 1]
        ratio = float(np.sin(f / (num_frames - 1) * np.pi / 2))
        import jax.numpy as jnp

        alpha = jnp.asarray([ratio], jnp.float32)
        pose = np.asarray(camera.pose_interpolate(
            jnp.asarray(sample1["pose"]), jnp.asarray(sample2["pose"]), alpha))
        data = dict(pose=pose[None], intr=np.asarray(sample1["intr"])[None],
                    idx=np.asarray([0]))
        if has_light:
            pose_light = np.asarray(camera.pose_interpolate(
                jnp.asarray(sample1["pose_light"]), jnp.asarray(sample2["pose_light"]), alpha))
            data["pose_light"] = pose_light[None]
        maps = trainer.inference_outputs(data, image_size)
        tiles = []
        for content in video_content:
            if content == "gt":
                if hasattr(dataset, "find_closest_idx"):
                    gt_idx = dataset.find_closest_idx(pose, data.get("pose_light", [None])[0])
                    gt = np.asarray(dataset.get_full_sample(int(gt_idx))["image"])
                else:
                    gt = np.asarray(sample1["image"])
                tiles.append(annotate(to_uint8(gt), "gt (closest)"))
            else:
                key = content + "_map" if not content.endswith("_map") else content
                if key in maps:
                    tiles.append(annotate(to_uint8(maps[key][0]), content))
        frames.append(create_collage(tiles))
        if show_pbar:
            print(f"[test_video] frame {f + 1}/{num_frames}")
    frames = frames + frames[::-1]  # mirrored loop
    path = os.path.join(output_dir, f"video_{idx1}_{idx2}.mp4")
    write_video(path, frames, fps=fps)
    return path
