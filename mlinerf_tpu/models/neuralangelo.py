"""Neuralangelo: hash-grid SDF + NeuS volume rendering (flax.linen).

Counterpart of the reference renderer (``projects/neuralangelo/model.py``):
hierarchical NeuS sampling, SDF->alpha conversion with cosine annealing,
numerical (tap-batched) SDF gradients, inverse-distance background samples,
sphere/AABB distance bounds, and sphere-traced surface intersection.

TPU-first structure: ``render_rays`` is one pure function of
(params, rays, rng, cond) with static shapes; the training/inference split is
a static ``train`` flag (two jitted programs sharing all submodules). The
per-iteration schedule state (progress, active-level mask, normal epsilon)
arrives in ``cond`` as traced scalars/vectors, so nothing recompiles across
the 500k-iteration run.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import register
from mlinerf_tpu.models.fields import (
    BackgroundNeRF,
    NeuralRGB,
    NeuralSDF,
    numerical_gradient_taps,
    numerical_gradients,
)
from mlinerf_tpu.ops import hashgrid
from mlinerf_tpu.utils import camera, geometry, render
from mlinerf_tpu.utils import losses as loss_lib
from mlinerf_tpu.utils import sampling as samp


def make_cond(cfg_model, current_iter: int, max_iter: int, warm_up_end: int = 0):
    """Build the per-iteration schedule inputs (all traced-friendly).

    Mirrors ``set_active_levels``/``set_normal_epsilon``/progress updates of
    the reference trainer (projects/neuralangelo/trainer.py:65-76 and
    utils/modules.py:97-107) but as explicit values fed into the jitted step.
    Works with python ints (host side) or traced scalars.
    """
    cfg_sdf = cfg_model.object.sdf
    cond: Dict[str, Any] = {}
    cond["progress"] = jnp.asarray(current_iter / max_iter, jnp.float32)
    if cfg_sdf.encoding.type == "hashgrid":
        spec_levels = cfg_sdf.encoding.levels
        resolutions = jnp.asarray(
            NeuralSDFSpecCache.get(cfg_sdf).resolutions, jnp.float32
        )
        if cfg_sdf.encoding.coarse2fine.enabled:
            step = cfg_sdf.encoding.coarse2fine.step
            init_level = cfg_sdf.encoding.coarse2fine.init_active_level
            anneal_levels = jnp.maximum((current_iter - warm_up_end) // step, 1)
            anneal_levels = jnp.clip(anneal_levels, 1, spec_levels)
            active_levels = jnp.maximum(init_level, anneal_levels)
            cond["active_levels"] = active_levels
            cond["anneal_levels"] = anneal_levels
            cond["level_mask"] = hashgrid.active_levels_to_mask(active_levels, spec_levels)
            eps_res = resolutions[jnp.asarray(anneal_levels, jnp.int32) - 1]
        else:
            cond["level_mask"] = None
            eps_res = resolutions[-1]
        cond["normal_eps"] = 1.0 / eps_res
    else:
        cond["level_mask"] = None
        cond["normal_eps"] = jnp.asarray(1e-3, jnp.float32)
    return cond


def get_iter_cos(true_cos, progress, anneal_end: float):
    """Annealed, always-non-positive cosine for NeuS section estimates.

    Keeps the cos value alive early in training (reference
    projects/neuralangelo/model.py:511-515).
    """
    anneal_ratio = jnp.minimum(progress / anneal_end, 1.0)
    return -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - anneal_ratio)
        + jax.nn.relu(-true_cos) * anneal_ratio
    )


class NeuralSDFSpecCache:
    """Small helper to expose hash-grid static metadata without a module."""

    @staticmethod
    def get(cfg_sdf):
        from mlinerf_tpu.models.fields import make_hashgrid_spec

        return make_hashgrid_spec(cfg_sdf.encoding)


@register("model", "neuralangelo")
class Model(nn.Module):
    """Neuralangelo renderer. Construct with ``Model(cfg_model, cfg_data)``
    (positional via factory below) — as a linen module, config rides in as a
    static attribute.
    """

    cfg_model: Any
    cfg_data: Any
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg_model = self.cfg_model
        self.cfg_render = cfg_model.render
        self.white_background = cfg_model.background.white
        self.with_background = cfg_model.background.enabled
        self.with_appear_embed = cfg_model.appear_embed.enabled
        self.anneal_end = cfg_model.object.s_var.anneal_end
        self.outside_val = 1000.0 * (-1 if cfg_model.object.sdf.mlp.get("inside_out", False) else 1)
        self.neural_sdf = NeuralSDF(cfg_model.object.sdf, compute_dtype=self.compute_dtype)
        self.neural_rgb = self._build_rgb()
        if self.with_background:
            self.background_nerf = self._build_background()
        else:
            self.background_nerf = None
        self.s_var = self.param(
            "s_var", nn.initializers.constant(cfg_model.object.s_var.init_val), ()
        )
        if self.with_appear_embed:
            self.appear_embed = nn.Embed(self.cfg_data.num_images, cfg_model.appear_embed.dim)
            if self.with_background:
                self.appear_embed_outside = nn.Embed(
                    self.cfg_data.num_images, cfg_model.appear_embed.dim
                )
        if self.cfg_data.get("bounding_type") == "box":
            self.bounding_type = "box"
            self.bounding_box_aabb = np.asarray(self.cfg_data.bounding_box_aabb, np.float32)
        else:
            self.bounding_type = "unit_sphere"
            self.bounding_box_aabb = None

    def _build_rgb(self):
        return NeuralRGB(
            self.cfg_model.object.rgb,
            feat_dim=self.cfg_model.object.sdf.mlp.hidden_dim,
            appear_embed=self.cfg_model.appear_embed,
            compute_dtype=self.compute_dtype,
        )

    def _build_background(self):
        return BackgroundNeRF(
            self.cfg_model.background, appear_embed=self.cfg_model.appear_embed,
            compute_dtype=self.compute_dtype,
        )

    # ------------------------------------------------------------------
    # Geometry helpers
    # ------------------------------------------------------------------

    def get_dist_bounds(self, center, ray_unit):
        if self.bounding_type == "box":
            near, far, outside = geometry.dist_bounds_aabb(center, ray_unit, self.bounding_box_aabb)
        else:
            near, far, outside = geometry.dist_bounds_sphere(center, ray_unit, radius=1.0)
        return jax.lax.stop_gradient(near), jax.lax.stop_gradient(far), outside

    def sdf_only(self, points, cond):
        """SDF at points (no feature head) — used by sampling/tracing.

        ``cond['max_levels']`` (a static python int, when present) truncates
        the hash levels actually gathered. ``cond['corner_key']`` (train path,
        ``gradient.corner_sample.enabled``) routes any backward through the
        corner-sampled table scatter (ops/hashgrid.corner_sampled_combine) —
        a no-op for the stop-gradient'd sampling/tracing callers.
        """
        return self.neural_sdf(points, level_mask=cond.get("level_mask"),
                               with_sdf=True, with_feat=False,
                               max_levels=cond.get("max_levels"),
                               corner_key=cond.get("corner_key"))[0]

    def sphere_trace(self, center, ray_unit, near, far, cond, num_iters=20, dist_start=None):
        sdf_fn = lambda pts: jax.lax.stop_gradient(self.sdf_only(pts, cond))
        return geometry.sphere_tracing_intersection(
            sdf_fn, center, ray_unit, near, far, num_iters=num_iters, dist_start=dist_start
        )

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------

    def sample_dists_all(self, center, ray_unit, near, far, cond, stratified, rng):
        """Coarse + hierarchical NeuS importance sampling (no gradients).

        ``render.sampling_levels`` (optional int) evaluates the SDF for the
        importance PDF with only the first K hash levels active — importance
        sampling needs coarse geometry, not fine detail, and these throwaway
        evaluations are a large share of the per-step hash-gather traffic on
        TPU. Default: all levels (reference-exact behavior).
        """
        cfgr = self.cfg_render
        num_hier = cfgr.num_sample_hierarchy
        sampling_cond = cond
        k_sampling = cfgr.get("sampling_levels")
        if k_sampling and self.cfg_model.object.sdf.encoding.type == "hashgrid":
            sampling_cond = dict(cond)
            cap = cond.get("max_levels")  # window-static coarse2fine cap
            sampling_cond["max_levels"] = (
                int(k_sampling) if cap is None else min(int(k_sampling), int(cap))
            )
        k_coarse = rng
        occ_cfg = cfgr.get("occupancy")
        if occ_cfg and occ_cfg.get("enabled") and cond.get("occupancy_grid") is not None:
            from mlinerf_tpu.ops import occupancy as occ_ops

            hg = self.cfg_model.object.sdf.encoding.hashgrid
            dists = occ_ops.occupancy_coarse_dists(
                cond["occupancy_grid"], center, ray_unit, near, far,
                cfgr.num_samples.coarse,
                float(hg.range[0]), float(hg.range[1]),
                march_bins=int(occ_cfg.get("march_bins", 128)),
                floor=float(occ_cfg.get("floor", 0.02)),
                stratified=stratified, key=k_coarse,
            )
        else:
            dists = samp.sample_dists(
                ray_unit.shape[:-1], (near[..., None], far[..., None]),
                cfgr.num_samples.coarse, stratified, key=k_coarse,
            )
        if num_hier > 0:
            points = camera.get_3D_points_from_dist(center, ray_unit, dists)
            sdfs = self.sdf_only(points, sampling_cond)[..., 0]  # [B,R,N]
        for h in range(num_hier):
            weights = samp.neus_pdf_weights(dists, sdfs, inv_s=64 * 2**h)
            dists_fine = samp.sample_dists_from_pdf(dists, weights, cfgr.num_samples.fine)
            dists = jnp.concatenate([dists, dists_fine], axis=-2)
            sort_idx = jnp.argsort(dists[..., 0], axis=-1)
            dists = jnp.take_along_axis(dists, sort_idx[..., None], axis=-2)
            if h != num_hier - 1:
                points_fine = camera.get_3D_points_from_dist(center, ray_unit, dists_fine)
                sdfs_fine = self.sdf_only(points_fine, sampling_cond)[..., 0]
                sdfs = jnp.concatenate([sdfs, sdfs_fine], axis=-1)
                sdfs = jnp.take_along_axis(sdfs, sort_idx, axis=-1)
        return jax.lax.stop_gradient(dists)

    def sample_dists_background(self, ray_unit, far, stratified, rng, eps=1e-5):
        inv_dists = samp.sample_dists(
            ray_unit.shape[:-1], (1.0, 0.0), self.cfg_render.num_samples.background,
            stratified, key=rng,
        )
        return jax.lax.stop_gradient(far[..., None] / (inv_dists + eps))

    # ------------------------------------------------------------------
    # NeuS alphas
    # ------------------------------------------------------------------

    def compute_neus_alphas(self, ray_unit, sdfs, gradients, dists, dist_far, progress, eps=1e-5):
        """SDF volume rendering (NeuS CDF-ratio alphas with cos annealing)."""
        sdfs = sdfs[..., 0]  # [B,R,N]
        inv_s = jnp.exp(self.s_var)
        true_cos = jnp.sum(ray_unit[..., None, :] * gradients, axis=-1)
        iter_cos = self._get_iter_cos(true_cos, progress)
        if dist_far is None:
            dist_far = jnp.full_like(dists[..., :1, :], 1e10)
        dists_aug = jnp.concatenate([dists, dist_far], axis=-2)
        dist_intvs = dists_aug[..., 1:, 0] - dists_aug[..., :-1, 0]
        est_prev_sdf = sdfs - iter_cos * dist_intvs * 0.5
        est_next_sdf = sdfs + iter_cos * dist_intvs * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev_sdf * inv_s)
        next_cdf = jax.nn.sigmoid(est_next_sdf * inv_s)
        alphas = jnp.clip((prev_cdf - next_cdf) / (prev_cdf + eps), 0.0, 1.0)
        return alphas

    def _get_iter_cos(self, true_cos, progress):
        return get_iter_cos(true_cos, progress, self.anneal_end)

    # ------------------------------------------------------------------
    # Gradients (numerical tap-batched or analytical)
    # ------------------------------------------------------------------

    def compute_gradients(self, points, cond, training: bool, sdf=None):
        mode = self.cfg_model.object.sdf.gradient.mode
        if mode == "analytical":
            # Rematerialize the field in every differentiation pass: the
            # grad-of-grad pipeline otherwise stores gather outputs and
            # scatter staging for each nesting level (observed 18+ GB HBM at
            # production size).
            sdf_fn = jax.checkpoint(lambda p: self.sdf_only(p, cond).sum())
            gradient = jax.grad(sdf_fn)(points)
            hessian = None
            if training:
                # Diagonal of the Hessian via 3 HVPs.
                grad_fn = jax.checkpoint(lambda p: jax.grad(sdf_fn)(p))
                hs = []
                for d in range(3):
                    tangent = jnp.zeros_like(points).at[..., d].set(1.0)
                    _, hvp = jax.jvp(grad_fn, (points,), (tangent,))
                    hs.append(hvp[..., d])
                hessian = jnp.stack(hs, axis=-1)
            else:
                gradient = jax.lax.stop_gradient(gradient)
            return gradient, hessian
        # Numerical: batch every tap into one field evaluation.
        taps = self.cfg_model.object.sdf.gradient.taps
        eps = cond["normal_eps"]
        offsets = numerical_gradient_taps(taps, eps)  # [T,3]
        pts_tap = points[..., None, :] + offsets  # [...,T,3]
        sdf_taps = self.sdf_only(pts_tap, cond)[..., 0]  # [...,T]
        return numerical_gradients(sdf_taps, sdf, taps, eps, training)

    def eval_field_with_gradients(self, points, outside, cond, train: bool):
        """Center SDF + feature head + SDF gradients, in one encoder pass when
        possible.

        With ``object.sdf.gradient.shared_levels > 0`` (numerical mode,
        hashgrid encoding) the center and the gradient-tap evaluations run as
        one fused stencil whose coarse levels share their corner gathers —
        the scatter-add row reduction that dominates TPU step time (PERF.md).
        Otherwise this is exactly the reference's two-call structure.

        Returns (sdfs [...,1], feats [...,W], gradients [...,3], hessians).
        """
        grad_cfg = self.cfg_model.object.sdf.gradient
        shared_cfg = grad_cfg.get("shared_levels") or 0
        if shared_cfg == "auto":
            # Share every level EXCEPT the finest active one: the tap spacing
            # equals the finest active level's cell size, so only that level's
            # taps cross into neighboring cells (where the shared path's
            # in-cell extrapolation diverges from the true finite difference).
            # Uses the window-static coarse2fine cap when present (train
            # path, trainers/base.py); falls back to all-but-last globally.
            cap = cond.get("max_levels")
            levels = self.cfg_model.object.sdf.encoding.levels
            shared = max((int(cap) if cap is not None else levels) - 1, 0)
        else:
            shared = int(shared_cfg)
        if (
            grad_cfg.mode != "analytical"
            and shared > 0
            and self.cfg_model.object.sdf.encoding.type == "hashgrid"
        ):
            taps = grad_cfg.taps
            eps = cond["normal_eps"]
            offsets = numerical_gradient_taps(taps, eps)  # [T,3]
            sdfs, feats, sdf_taps = self.neural_sdf.stencil(
                points, offsets, level_mask=cond.get("level_mask"), shared_levels=shared,
                max_levels=cond.get("max_levels"),
                corner_key=cond.get("corner_key"),
            )
            sdfs = jnp.where(outside[..., None], self.outside_val, sdfs)
            gradients, hessians = numerical_gradients(sdf_taps, sdfs, taps, eps, train)
            hess_cfg = grad_cfg.get("hessian", {}) or {}
            if train and hess_cfg.get("mode", "shared") == "exact":
                # Shared-level tap features are linear in the offset, so the
                # second difference sees no encoder curvature there — the
                # curvature loss is systematically underestimated (the
                # round-1 stencil PSNR gap, PERF.md). Re-estimate the
                # hessian from EXACT taps on a strided sample subset: the
                # curvature loss is a mean over samples, so a subset is an
                # unbiased (noisier) estimate at fraction*taps extra
                # scatter rows instead of the full exact-tap cost.
                frac = float(hess_cfg.get("fraction", 0.25))
                k = max(int(round(1.0 / max(frac, 1e-6))), 1)
                pts_sub = points[..., ::k, :]
                sdf_sub = sdfs[..., ::k, :]
                out_sub = outside[..., ::k]
                pts_tap = pts_sub[..., None, :] + offsets  # [...,S/k,T,3]
                sdf_taps_exact = self.sdf_only(pts_tap, cond)[..., 0]
                _, hessians = numerical_gradients(
                    sdf_taps_exact, sdf_sub, taps, eps, True)
                # Pre-mask outside points: the subset shape no longer matches
                # output["outside"], so the trainer skips its own masking.
                hessians = hessians * (~out_sub[..., None]).astype(hessians.dtype)
        else:
            sdfs, feats = self.neural_sdf(points, level_mask=cond.get("level_mask"),
                                          max_levels=cond.get("max_levels"),
                                          corner_key=cond.get("corner_key"))
            sdfs = jnp.where(outside[..., None], self.outside_val, sdfs)
            gradients, hessians = self.compute_gradients(points, cond, training=train, sdf=sdfs)
        return sdfs, feats, gradients, hessians

    def eval_field_for_render(self, points, outside, cond, train, ray_unit, dists, far):
        """Field evaluation entry for the object render path.

        Dispatches to the importance-subsampled gradient path
        (``gradient.subsample.enabled``) during training, else to the plain
        :meth:`eval_field_with_gradients`.
        """
        sub = self.cfg_model.object.sdf.gradient.get("subsample")
        if train and sub and sub.get("enabled"):
            return self.eval_field_grad_subsampled(
                points, outside, cond, ray_unit, dists, far)
        return self.eval_field_with_gradients(points, outside, cond, train)

    def eval_field_grad_subsampled(self, points, outside, cond, ray_unit, dists, far):
        """Importance-subsampled encoder gradients (train only).

        Backward scatter-add rows into the hash tables scale with the number
        of GRADIENT-BEARING sample evaluations, not with what the forward
        composite needs — and the train step is scatter-bound at every gated
        config (PERF.md). So: evaluate the field for ALL samples with
        gradients stopped, select the ``topk`` highest compositing-weight
        samples per ray (plus every ``stride``-th sample as a coverage set so
        empty space keeps eikonal/opacity supervision), re-evaluate only the
        selected samples differentiably, and merge by sample index. The loss
        VALUES are unchanged w.r.t. the full forward (identical composite);
        parameter gradients become an importance-weighted subsample over
        samples — quality-gated like every other row cut
        (scripts/quality_ab.py AB_STUDY=topk).

        Cost model (v5e): pays one extra no-grad forward (gathers, ~10x
        cheaper than scatters) to cut backward scatter rows to K/S.
        """
        sub = self.cfg_model.object.sdf.gradient.subsample
        ng = jax.lax.stop_gradient(
            self.eval_field_with_gradients(points, outside, cond, train=False)
        )
        sdfs_ng, feats_ng, grads_ng, _ = ng
        alphas = self.compute_neus_alphas(
            ray_unit, sdfs_ng, grads_ng, dists, dist_far=far[..., None],
            progress=cond["progress"],
        )
        weights = render.alpha_compositing_weights(alphas)[..., 0]  # [B,R,S]
        num = weights.shape[-1]
        k = min(int(sub.get("topk", 24)), num)
        _, idx = jax.lax.top_k(weights, k)  # [B,R,k]
        stride = int(sub.get("stride", 8) or 0)
        if stride > 0:
            cov = jnp.arange(0, num, stride, dtype=idx.dtype)
            cov = jnp.broadcast_to(cov, idx.shape[:-1] + cov.shape)
            # Duplicate indices are harmless: both writes carry the SAME
            # value (same point, same pass), and `.set` routes the cotangent
            # to exactly one of them.
            idx = jnp.concatenate([idx, cov], axis=-1)  # [B,R,K]
        pts_k = jnp.take_along_axis(points, idx[..., None], axis=-2)
        sdfs_k, feats_k, grads_k, hess_k = self.eval_field_with_gradients(
            pts_k, outside, cond, train=True
        )
        def put(full, sub):
            ind = jnp.broadcast_to(idx[..., None], sub.shape)
            return jnp.put_along_axis(full, ind, sub, axis=-2, inplace=False)

        sdfs = put(sdfs_ng, sdfs_k)
        feats = put(feats_ng, feats_k)
        gradients = put(grads_ng, grads_k)
        # Hessians stay on the selected subset (possibly further strided by
        # the exact-hessian path); the curvature loss is a subset mean and
        # the trainer's shape guard handles the reduced sample axis.
        return sdfs, feats, gradients, hess_k

    # ------------------------------------------------------------------
    # Rendering
    # ------------------------------------------------------------------

    def get_appearance_embedding(self, sample_idx, num_rays):
        if not self.with_appear_embed:
            return None, None
        cfgr = self.cfg_render
        num_samples_all = cfgr.num_samples.coarse + cfgr.num_samples.fine * cfgr.num_sample_hierarchy
        app = self.appear_embed(sample_idx)[:, None, None]
        app = jnp.broadcast_to(app, (app.shape[0], num_rays, num_samples_all, app.shape[-1]))
        app_outside = None
        if self.with_background:
            app_outside = self.appear_embed_outside(sample_idx)[:, None, None]
            app_outside = jnp.broadcast_to(
                app_outside,
                (app_outside.shape[0], num_rays, cfgr.num_samples.background, app_outside.shape[-1]),
            )
        return app, app_outside

    def _with_corner_key(self, cond, rng, train: bool):
        """Inject the per-step corner-sampling key into ``cond`` (train only).

        ``gradient.corner_sample.enabled`` routes every hash-table backward
        scatter through the unbiased single-corner estimator
        (ops/hashgrid.corner_sampled_combine). Numerical-gradient modes only:
        the analytical mode double-differentiates the encoder and custom_vjp
        is reverse-mode-only.
        """
        grad_cfg = self.cfg_model.object.sdf.gradient
        cs = grad_cfg.get("corner_sample", {}) or {}
        if not (train and cs.get("enabled") and grad_cfg.mode != "analytical"
                and self.cfg_model.object.sdf.encoding.type == "hashgrid"):
            return cond
        cond = dict(cond)
        cond["corner_key"] = jax.random.fold_in(rng, 0x5A11)
        return cond

    def render_rays(self, center, ray_unit, cond, sample_idx=None, stratified=False,
                    rng=None, train: bool = True):
        """Render a chunk of rays. Returns the reference's output dict
        (projects/neuralangelo/model.py:337-369)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        cond = self._with_corner_key(cond, rng, train)
        k_obj, k_bg = jax.random.split(rng)
        near, far, outside = self.get_dist_bounds(center, ray_unit)
        app, app_outside = self.get_appearance_embedding(sample_idx, ray_unit.shape[1]) \
            if sample_idx is not None else (None, None)
        out_obj = self.render_rays_object(
            center, ray_unit, near, far, outside, app, cond, stratified, k_obj, train
        )
        if self.with_background:
            out_bg = self.render_rays_background(center, ray_unit, far, app_outside, cond,
                                                 stratified, k_bg)
            rgbs = jnp.concatenate([out_obj["rgbs"], out_bg["rgbs"]], axis=-2)
            dists = jnp.concatenate([out_obj["dists"], out_bg["dists"]], axis=-2)
            alphas = jnp.concatenate([out_obj["alphas"], out_bg["alphas"]], axis=-1)
        else:
            rgbs, dists, alphas = out_obj["rgbs"], out_obj["dists"], out_obj["alphas"]
        weights = render.alpha_compositing_weights(alphas)
        rgb = render.composite(rgbs, weights)
        if self.white_background:
            opacity_all = render.composite_opacity(weights)
            rgb = rgb + (1 - opacity_all)
        output = dict(
            rgb=rgb,
            opacity=out_obj["opacity"],
            outside=outside,
            dists=dists,
            weights=weights,
            gradient=out_obj["gradient"],
            gradients=out_obj["gradients"],
            hessians=out_obj["hessians"],
        )
        return output

    def render_rays_object(self, center, ray_unit, near, far, outside, app, cond,
                           stratified, rng, train: bool):
        dists = self.sample_dists_all(center, ray_unit, near, far, cond, stratified, rng)
        points = camera.get_3D_points_from_dist(center, ray_unit, dists)
        sdfs, feats, gradients, hessians = self.eval_field_for_render(
            points, outside, cond, train, ray_unit, dists, far
        )
        rays_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
        normals = loss_lib.safe_normalize(gradients)
        rgbs = self.neural_rgb(points, normals, rays_unit, feats, app=app)
        alphas = self.compute_neus_alphas(
            ray_unit, sdfs, gradients, dists, dist_far=far[..., None], progress=cond["progress"]
        )
        if not train:
            weights = render.alpha_compositing_weights(alphas)
            opacity = render.composite_opacity(weights)
            gradient = render.composite(gradients, weights)
        else:
            opacity = None
            gradient = None
        return dict(
            rgbs=rgbs,
            sdfs=sdfs[..., 0],
            dists=dists,
            alphas=alphas,
            opacity=opacity,
            gradient=gradient,
            gradients=gradients,
            hessians=hessians,
        )

    def render_rays_background(self, center, ray_unit, far, app_outside, cond, stratified, rng):
        dists = self.sample_dists_background(ray_unit, far, stratified, rng)
        points = camera.get_3D_points_from_dist(center, ray_unit, dists)
        rays_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
        rgbs, densities = self.background_nerf(points, rays_unit, app_outside=app_outside)
        alphas = render.volume_rendering_alphas_dist(densities, dists)
        return dict(rgbs=rgbs, dists=dists, alphas=alphas)

    # ------------------------------------------------------------------
    # Entry points
    # ------------------------------------------------------------------

    def __call__(self, data, cond, rng, train: bool = True):
        """Training forward: render the pre-sampled rays of each image.

        data: dict with pose [B,3,4], intr [B,3,3], ray_idx [B,R], idx [B].
        """
        image_size = self.cfg_data.train.image_size
        center, ray = camera.get_center_and_ray(data["pose"], data["intr"], image_size)
        center = samp.slice_by_ray_idx(center, data["ray_idx"])
        ray = samp.slice_by_ray_idx(ray, data["ray_idx"])
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        return self.render_rays(
            center, ray_unit, cond,
            sample_idx=data["idx"] if self.with_appear_embed else None,
            stratified=self.cfg_render.stratified and train, rng=rng, train=train,
        )

    def render_chunk(self, center, ray, cond, sample_idx=None, rng=None):
        """Inference on a chunk of full-image rays: adds depth/normals."""
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        out = self.render_rays(center, ray_unit, cond, sample_idx=sample_idx,
                               stratified=False, rng=rng, train=False)
        dist = render.composite(out["dists"], out["weights"])
        depth = dist / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        out["depth"] = depth
        return out
