"""Vanilla-NeRF trainer: MSE render loss on coarse+fine, PSNR metric.

Counterpart of ``projects/nerf/trainers/nerf.py``.
"""

from __future__ import annotations

from mlinerf_tpu.config import register
from mlinerf_tpu.trainers.base import BaseTrainer
from mlinerf_tpu.utils import losses as loss_lib


@register("trainer", "nerf")
class Trainer(BaseTrainer):
    def num_rand_rays(self) -> int:
        return self.cfg.model.rand_rays

    def _dummy_batch(self):
        batch = super()._dummy_batch()
        return batch

    def init_losses(self, cfg):
        super().init_losses(cfg)
        self.weights.setdefault("render", 1.0)
        if cfg.model.fine_sampling:
            self.weights.setdefault("render_fine", 1.0)

    def compute_loss(self, output, batch, mode: str):
        losses = {}
        metrics = {}
        if mode == "train":
            target = batch["image_sampled"]
            losses["render"] = loss_lib.mse_loss(output["rgb"], target)
            if "rgb_fine" in output:
                losses["render_fine"] = loss_lib.mse_loss(output["rgb_fine"], target)
                metrics["psnr"] = loss_lib.psnr(output["rgb_fine"], target)
            else:
                metrics["psnr"] = loss_lib.psnr(output["rgb"], target)
        else:
            target = batch["image"]
            pred = output.get("rgb_map", output["rgb"])
            losses["render"] = loss_lib.mse_loss(pred, target)
            metrics["psnr"] = loss_lib.psnr(pred, target)
        return losses, metrics
