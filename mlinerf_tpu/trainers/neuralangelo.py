"""Neuralangelo trainer: L1 render loss (x3), eikonal + curvature regularizers
with coarse-to-fine scheduling.

Counterpart of ``projects/neuralangelo/trainer.py``. The per-iteration
schedule (progress, active hash levels, normal epsilon, curvature weight) is
computed INSIDE the jitted step from the iteration counter via
``models.neuralangelo.make_cond`` — the TPU-native version of
``_start_of_iteration`` (trainer.py:65-76).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import register
from mlinerf_tpu.models.neuralangelo import make_cond
from mlinerf_tpu.trainers.base import BaseTrainer
from mlinerf_tpu.utils import losses as loss_lib


@register("trainer", "neuralangelo")
class Trainer(BaseTrainer):
    def __init__(self, cfg, is_inference: bool = False, seed: int = 0, logdir=None):
        self.warm_up_end = cfg.optim.sched.get("warm_up_end", 0)
        self.cfg_gradient = cfg.model.object.sdf.gradient
        super().__init__(cfg, is_inference=is_inference, seed=seed, logdir=logdir)

    def make_cond(self, iteration):
        return make_cond(self.cfg.model, iteration, self.cfg.max_iter, self.warm_up_end)

    def static_max_levels_for(self, it_end: int):
        """Active-level count at ``it_end`` (host-side mirror of make_cond's
        coarse2fine schedule, models/neuralangelo.py:55-63). The traced
        level_mask stays authoritative for every step in the window; this cap
        only lets the encoder skip levels the mask would zero anyway."""
        cfg_sdf = self.cfg.model.object.sdf
        if not self.cfg.trainer.get("static_level_truncation", True):
            return None
        if cfg_sdf.encoding.type != "hashgrid" or not cfg_sdf.encoding.coarse2fine.enabled:
            return None
        c2f = cfg_sdf.encoding.coarse2fine
        levels = cfg_sdf.encoding.levels
        anneal = max((int(it_end) - self.warm_up_end) // c2f.step, 1)
        return int(min(max(c2f.init_active_level, anneal), levels))

    def loss_weights_at(self, iteration, cond):
        weights = super().loss_weights_at(iteration, cond)
        cfg_sdf = self.cfg.model.object.sdf
        if "curvature" in weights and cfg_sdf.encoding.type == "hashgrid" \
                and cfg_sdf.encoding.coarse2fine.enabled:
            # Warmup then decay by the growth factor per annealed level
            # (reference: get_curvature_weight, trainer.py:56-63).
            init_weight = weights["curvature"]
            it = jnp.asarray(iteration, jnp.float32)
            warm = it / max(self.warm_up_end, 1) * init_weight
            from mlinerf_tpu.models.fields import make_hashgrid_spec

            growth = make_hashgrid_spec(cfg_sdf.encoding).growth_rate
            decay_factor = growth ** (jnp.asarray(cond["anneal_levels"], jnp.float32) - 1.0)
            weights["curvature"] = jnp.where(
                it <= self.warm_up_end, warm, init_weight / decay_factor
            )
        return weights

    def compute_loss(self, output, batch, mode: str):
        losses = {}
        metrics = {}
        if mode == "train":
            target = batch["image_sampled"]
            # L1 x3 quirk kept for parity (NeuralLumen/trainer.py:136).
            losses["render"] = loss_lib.l1_loss(output["rgb"], target) * 3
            metrics["psnr"] = loss_lib.psnr(output["rgb"], target)
            if "eikonal" in self.weights:
                losses["eikonal"] = loss_lib.eikonal_loss(output["gradients"], outside=output["outside"])
            if "curvature" in self.weights and output.get("hessians") is not None:
                hess, outs = output["hessians"], output["outside"]
                # ``outside`` is per-ray ([B,R,1]) and broadcasts over the
                # sample axis. Only drop it when it genuinely cannot mask
                # this hessian (the strided-subset exact-hessian path, where
                # the model pre-masks): i.e. the shapes don't broadcast to
                # the laplacian's shape.
                try:
                    if np.broadcast_shapes(hess.shape[:-1], outs.shape) != hess.shape[:-1]:
                        outs = None
                except ValueError:
                    outs = None
                losses["curvature"] = loss_lib.curvature_loss(hess, outside=outs)
            metrics["s_var"] = output.get("s_var", jnp.zeros(()))
        else:
            target = batch["image"]
            pred = output.get("rgb_map", output["rgb"])
            losses["render"] = loss_lib.l1_loss(pred, target)
            metrics["psnr"] = loss_lib.psnr(pred, target)
        return losses, metrics
