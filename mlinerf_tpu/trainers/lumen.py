"""NeuralLumen (MLI-NeRF) trainer: stage-b machinery — warm start, partial
training, intrinsic / weighted-shading / residual-regularizer losses, and the
``test_all_light`` pseudo-label renderer.

Counterpart of ``projects/NeuralLumen/trainer.py``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import numpy as np

from mlinerf_tpu.config import register
from mlinerf_tpu.trainers.neuralangelo import Trainer as AngeloTrainer
from mlinerf_tpu.utils import losses as loss_lib
from mlinerf_tpu.utils.image_io import save_image


def get_random_other_index(num_indexes: int, length_selected: int, seed: int = 0):
    """For each frame, [itself + (length-1) random other frames] — used by the
    'unpair' pseudo-label setting (reference utils.py:230-252)."""
    import random as _random

    _random.seed(seed)
    index_lists = []
    for i in range(num_indexes):
        current = [i]
        others = [j for j in range(num_indexes) if j != i]
        current.extend(_random.sample(others, length_selected - 1))
        index_lists.append(current)
    return index_lists


@register("trainer", "lumen")
class Trainer(AngeloTrainer):
    def __init__(self, cfg, is_inference: bool = False, seed: int = 0, logdir=None):
        super().__init__(cfg, is_inference=is_inference, seed=seed, logdir=logdir)
        tcfg = cfg.trainer
        if "intrinsic" in self.weights:
            p = tcfg.para_intrinsic_loss
            self.criteria_intrinsic = partial(
                loss_lib.intrinsic_loss,
                weight_map_range_shading=tuple(p["weight_map_range_shading"]),
                weight_map_range_visibility=tuple(p["weight_map_range_visibility"]),
                factor_ref=p["factor_ref"],
                factor_sha=p["factor_sha"],
            )
        if "regularize_re" in self.weights:
            p = tcfg.para_regularize_re_loss
            self.criteria_regularize_re = partial(
                loss_lib.regularize_re_loss,
                factor_negative=p["factor_negative"],
                factor_positive=p["factor_positive"],
                exponent_positive=p["exponent_positive"],
            )
        if "weighted_shading" in self.weights:
            rng = tuple(tcfg.get("weighted_shading_weight_range", (0.0, 1.0)))
            self.criteria_weighted_shading = partial(loss_lib.weighted_shading_loss, weight_range=rng)

    def _needs_light(self) -> bool:
        return True

    def pixel_array_keys(self):
        keys = [("images", "image_sampled")]
        # Pseudo-label maps ride along per sampled ray when present.
        keys += [
            ("pseudo_ref", "pseudo_ref_sampled"),
            ("pseudo_sha", "pseudo_sha_sampled"),
            ("pseudo_visibility_certainty", "pseudo_visibility_certainty_sampled"),
        ]
        return keys

    def compute_loss(self, output, batch, mode: str):
        losses, metrics = super().compute_loss(output, batch, mode)
        if mode == "train":
            if "weighted_shading" in self.weights and "o_s" in output:
                losses["weighted_shading"] = self.criteria_weighted_shading(
                    output["o_s"], output["pseudo_shading"]
                )
            if "intrinsic" in self.weights and "pseudo_ref_sampled" in batch:
                losses["intrinsic"] = self.criteria_intrinsic(
                    output["o_r"],
                    output["o_s"],
                    batch["pseudo_ref_sampled"],
                    batch["pseudo_sha_sampled"],
                    batch["pseudo_visibility_certainty_sampled"],
                )
            if "regularize_re" in self.weights and "o_re" in output:
                losses["regularize_re"] = self.criteria_regularize_re(output["o_re"])
        else:
            if "regularize_re" in self.weights and "o_re_map" in output:
                losses["regularize_re"] = self.criteria_regularize_re(output["o_re_map"])
        return losses, metrics

    # ------------------------------------------------------------------
    # Pseudo-label rendering over all (camera, light) combinations
    # ------------------------------------------------------------------

    def test_all_light(self, dataset, output_dir: str, mode: str = "test",
                       dataset_type: str = "pair", sample_num: int = 4, seed: int = 999,
                       save_pngs: bool = True):
        """Render rgb/normal/visibility/normal.light maps for every (camera,
        light) pair and save ``results_all`` for the pseudo-label pipeline.

        Counterpart of projects/NeuralLumen/trainer.py:217-316. Results go to
        an ``.npz``-backed store (see pipelines/label_store) instead of a
        torch ``.pt``.
        """
        from mlinerf_tpu.pipelines.label_store import save_results_all

        image_size = self.cfg.data.val.image_size
        if dataset_type == "pair":
            index_info: Dict[int, Dict[int, int]] = {}
            for frame_index in range(len(dataset)):
                frame = dataset.list[frame_index]
                cam = frame.get("camera_index", frame_index)
                light = frame.get("light_index", 0)
                index_info.setdefault(cam, {})[light] = frame_index
        elif dataset_type == "unpair":
            info = get_random_other_index(len(dataset), sample_num, seed)
            index_info = {
                cam: {li: fi for li, fi in enumerate(info[cam])} for cam in range(len(info))
            }
        elif dataset_type == "limitedlights":
            frames = dataset.list
            pl_index_dict = {}
            for frame_index in range(sample_num):
                pl_index_dict[frames[frame_index]["pl_index"]] = frame_index
            index_info = {}
            for cam in range(len(frames)):
                index_info[cam] = {0: cam}
                pl0 = frames[cam]["pl_index"]
                pls = [p for p in pl_index_dict if p != pl0]
                for i, p in enumerate(pls):
                    index_info[cam][i + 1] = pl_index_dict[p]
        else:
            raise NotImplementedError(dataset_type)

        results_cam = {}
        for camera_index in index_info:
            save_path = os.path.join(output_dir, str(camera_index))
            os.makedirs(save_path, exist_ok=True)
            results_light = {}
            data_input = None
            for light_index in index_info[camera_index]:
                if dataset_type == "pair":
                    sample = dataset.get_full_sample(index_info[camera_index][light_index])
                else:
                    if light_index == 0:
                        data_input = dataset.get_full_sample(camera_index)
                        sample = data_input
                    else:
                        sample = dict(data_input)
                        sample["pose_light"] = dataset.get_light(
                            index_info[camera_index][light_index]
                        )
                data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
                maps = self.inference_outputs_light(data, image_size)
                prefix = f"{light_index}_"
                if save_pngs:
                    if dataset_type == "pair" or light_index == 0:
                        save_image(os.path.join(save_path, prefix + "rgb_target.png"),
                                   sample["image"])
                    save_image(os.path.join(save_path, prefix + "rgb_render.png"), maps["rgb_map"][0])
                    save_image(os.path.join(save_path, prefix + "normal.png"), maps["normal_map"][0],
                               from_range=(-1, 1))
                    for key in ("visibility", "inter_mask", "normal_x_light", "pseudo_shading"):
                        save_image(os.path.join(save_path, f"{prefix}{key}.png"),
                                   maps[key + "_map"][0])
                    # Min-max normalized camera-hit distance map (reference
                    # projects/NeuralLumen/trainer.py:299-300) — the
                    # pseudo-label debugging workflow reads it.
                    dist = maps["inter_dist_map"][0]
                    save_image(os.path.join(save_path, prefix + "inter_dist.png"),
                               dist, from_range=(float(dist.min()), float(dist.max())))
                results = {
                    "normal": maps["normal_map"],
                    "normal_x_light": maps["normal_x_light_map"],
                    "rgb_render": maps["rgb_map"],
                    "visibility": maps["visibility_map"],
                    "inter_mask": maps["inter_mask_map"],
                }
                if dataset_type == "pair":
                    results["rgb_target"] = np.asarray(sample["image"])[None]  # [1,H,W,3]
                results_light[str(light_index)] = results
            results_cam[str(camera_index)] = results_light
        save_results_all(results_cam, os.path.join(output_dir, "results_all"))
        return results_cam

    def inference_outputs_light(self, data, image_size):
        """Inference with the light-visibility branch forced on. Maps are
        [B,H,W,C]."""
        out = self.render_image_light(data, image_size)
        H, W = image_size
        to_map = lambda x: x.reshape(x.shape[0], H, W, -1)
        maps = {"rgb_map": to_map(out["rgb"])}
        rot = np.asarray(data["pose"])[..., :3, :3]
        normal_cam = -out["gradient"] @ np.swapaxes(rot, -1, -2)
        maps["normal_map"] = to_map(normal_cam)
        for key in ("visibility", "normal_x_light", "pseudo_shading", "inter_dist", "inter_mask"):
            maps[key + "_map"] = to_map(out[key].astype(np.float32))
        for key in ("o_r", "o_s", "o_re", "opacity", "depth"):
            if key in out:
                maps[key + "_map"] = to_map(out[key])
        return maps

    def render_image_light(self, data, image_size, num_rays_chunk: Optional[int] = None):
        """Full-image render with the light-visibility branch forced on.

        Thin wrapper over the shared ``BaseTrainer.render_image`` engine, so
        the pseudo-label pass (the ~1,600-image stage-a→b render loop,
        reference projects/NeuralLumen/trainer.py:217-316) gets the same
        fused / windowed (``runtime.inference_chunks_per_dispatch``) /
        per-chunk dispatch strategies as every other renderer.
        """
        return self.render_image(
            data, image_size, num_rays_chunk=num_rays_chunk,
            render_kwargs={"with_light_visibility": True},
        )
