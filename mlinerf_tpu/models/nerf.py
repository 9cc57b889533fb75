"""Vanilla NeRF (coarse + fine MLPs) — the framework's minimum end-to-end
model and CPU-runnable smoke-test target.

Counterpart of ``projects/nerf/models/nerf.py``: positional-encoded density
MLP with view-dependent RGB head, optional hierarchical fine sampling via
inverse-CDF resampling of coarse weights, NDC support, opaque background
compositing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mlinerf_tpu.config import register
from mlinerf_tpu.models.mlp import MLPwithSkipConnection
from mlinerf_tpu.utils import camera, render
from mlinerf_tpu.utils import encoding as enc
from mlinerf_tpu.utils import sampling as samp
from mlinerf_tpu.utils.misc import get_activation


class NeRFField(nn.Module):
    """Positional-encoded density + view-dependent color field."""

    cfg_model: Any
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg_model
        self.view_dep = cfg.view_dep
        self.L_3D = cfg.posenc.L_3D
        self.L_view = cfg.posenc.L_view
        input_3D_dim = 3 + 6 * self.L_3D if self.L_3D else 3
        layers_feat = list(cfg.mlp.layers_feat)
        layers_feat[0] = input_3D_dim
        layers_feat[-1] += 1  # +1 for density
        self.mlp_feat = MLPwithSkipConnection(
            layer_dims=tuple(layers_feat), skip_connection=tuple(cfg.mlp.skip),
            compute_dtype=self.compute_dtype,
        )
        layers_rgb = list(cfg.mlp.layers_rgb)
        input_view_dim = (3 + 6 * self.L_view if self.L_view else 3) if cfg.view_dep else 0
        layers_rgb[0] = cfg.mlp.layers_feat[-1] + input_view_dim
        self.mlp_rgb = MLPwithSkipConnection(
            layer_dims=tuple(layers_rgb), compute_dtype=self.compute_dtype,
        )
        self.density_activ = get_activation(cfg.density_activ)

    def _encode_3D(self, points):
        if self.L_3D:
            return jnp.concatenate([points, enc.positional_encoding(points, self.L_3D)], axis=-1)
        return points

    def _encode_view(self, rays):
        if self.L_view:
            return jnp.concatenate([rays, enc.positional_encoding(rays, self.L_view)], axis=-1)
        return rays

    def __call__(self, points_3D, ray_unit, density_reg=None, rng=None):
        out = self.mlp_feat(self._encode_3D(points_3D).astype(self.compute_dtype))
        density = out[..., 0].astype(jnp.float32)
        feat = jax.nn.relu(out[..., 1:])
        if density_reg is not None and rng is not None:
            density = density + jax.random.normal(rng, density.shape) * density_reg
        density = self.density_activ(density)
        if self.view_dep:
            feat = jnp.concatenate([feat, self._encode_view(ray_unit).astype(feat.dtype)], axis=-1)
        rgb = jax.nn.sigmoid(self.mlp_rgb(feat).astype(jnp.float32))
        return rgb, density


@register("model", "nerf")
class Model(nn.Module):
    """Vanilla NeRF renderer with optional fine network."""

    cfg_model: Any
    cfg_data: Any
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg_model
        self.fine_sampling = cfg.fine_sampling
        self.density_reg = cfg.get("density_noise_reg")
        self.opaque_background = cfg.opaque_background
        self.bgcolor = self.cfg_data.get("bgcolor", 1.0)
        self.nerf = NeRFField(cfg, compute_dtype=self.compute_dtype)
        if self.fine_sampling:
            self.nerf_fine = NeRFField(cfg, compute_dtype=self.compute_dtype)

    def render_rays(self, center, ray_unit, cond=None, stratified=False, rng=None,
                    train: bool = True):
        cfg = self.cfg_model
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_coarse, k_noise, k_noise2 = jax.random.split(rng, 3)
        dists = samp.sample_dists(
            ray_unit.shape[:-1], tuple(cfg.dist.range), cfg.sample_intvs, stratified, key=k_coarse
        )
        if cfg.dist.get("param", "metric") == "inverse":
            dists = 1.0 / (dists + 1e-8)
        dists = jax.lax.stop_gradient(dists)
        points = camera.get_3D_points_from_dist(center, ray_unit, dists)
        rays_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
        density_reg = self.density_reg if train else None
        rgbs, densities = self.nerf(points, rays_unit, density_reg=density_reg, rng=k_noise)
        weights = render.volume_rendering_weights_dist(densities, dists)
        opacity = render.composite_opacity(weights)
        rgb = render.composite(rgbs, weights)
        if self.opaque_background:
            rgb = rgb + self.bgcolor * (1 - opacity)
        dist = render.composite(dists, weights)
        output = dict(rgb=rgb, dist=dist, opacity=opacity)
        if self.fine_sampling:
            dists_mid = 0.5 * (dists[..., :-1, :] + dists[..., 1:, :])
            dists_fine = samp.sample_dists_from_pdf(
                dists_mid, weights[..., 1:-1, 0], cfg.sample_intvs_fine
            )
            dists_all = jnp.sort(jnp.concatenate([dists, dists_fine], axis=-2), axis=-2)
            dists_all = jax.lax.stop_gradient(dists_all)
            points = camera.get_3D_points_from_dist(center, ray_unit, dists_all)
            rays_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
            rgbs, densities = self.nerf_fine(points, rays_unit, density_reg=density_reg, rng=k_noise2)
            weights = render.volume_rendering_weights_dist(densities, dists_all)
            opacity = render.composite_opacity(weights)
            rgb = render.composite(rgbs, weights)
            if self.opaque_background:
                rgb = rgb + self.bgcolor * (1 - opacity)
            dist = render.composite(dists_all, weights)
            output.update(rgb_fine=rgb, dist_fine=dist, opacity_fine=opacity)
        return output

    def __call__(self, data, cond=None, rng=None, train: bool = True):
        """Training forward: render rays selected by data['ray_idx']."""
        image_size = self.cfg_data.train.image_size
        center, ray = camera.get_center_and_ray(data["pose"], data["intr"], image_size)
        if self.cfg_model.camera_ndc:
            center, ray = camera.convert_NDC(center, ray, intr=data["intr"])
        center = samp.slice_by_ray_idx(center, data["ray_idx"])
        ray = samp.slice_by_ray_idx(ray, data["ray_idx"])
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        return self.render_rays(
            center, ray_unit, stratified=self.cfg_model.sample_stratified and train,
            rng=rng, train=train,
        )

    def render_chunk(self, center, ray, cond=None, rng=None, **_):
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        out = self.render_rays(center, ray_unit, stratified=False, rng=rng, train=False)
        ray_norm = jnp.linalg.norm(ray, axis=-1, keepdims=True)
        out["depth"] = out["dist"] / ray_norm
        if self.fine_sampling:
            out["depth_fine"] = out["dist_fine"] / ray_norm
        return out
