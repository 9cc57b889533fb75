"""LumenModel — MLI-NeRF: light-position-conditioned rendering with intrinsic
decomposition (flax.linen).

Counterpart of ``projects/NeuralLumen/model.py``: every render is conditioned
on a per-pixel light position; the radiance head bank supports the four
intrinsic composition modes (r_s, r_s_re, rgb_r, rgb_r_s); light visibility
is computed by sphere tracing from the light toward the camera-ray surface hit
(or by the weight-peak-ratio estimator), producing the normal.light pseudo
shading used by the cross-light pseudo-label pipeline.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import register
from mlinerf_tpu.models.fields import BackgroundNeRF, LumenRGB
from mlinerf_tpu.models.neuralangelo import Model as AngeloModel
from mlinerf_tpu.utils import camera, geometry, render
from mlinerf_tpu.utils import losses as loss_lib
from mlinerf_tpu.utils import sampling as samp


@register("model", "lumen")
class Model(AngeloModel):
    """MLI-NeRF model. Inherits geometry/sampling from the Neuralangelo base;
    overrides the radiance path with the light-conditioned head bank."""

    def setup(self):
        super().setup()
        cfg_model = self.cfg_model
        self.rgb_network_mode = cfg_model.object.rgb.get("network_mode")
        lv = cfg_model.get("light_visibility")
        self.flag_light_visibility = bool(lv and lv.enabled)
        self.para_light_visibility = lv
        if self.flag_light_visibility and lv.get("gamma_correlation"):
            self.gamma_for_shading = float(lv.gamma_correlation)
        else:
            self.gamma_for_shading = None

    def _build_rgb(self):
        return LumenRGB(
            self.cfg_model.object.rgb,
            feat_dim=self.cfg_model.object.sdf.mlp.hidden_dim,
            appear_embed=self.cfg_model.appear_embed,
            compute_dtype=self.compute_dtype,
        )

    # Background conditioned on the light as well.
    def _build_background(self):
        return BackgroundNeRF(
            self.cfg_model.background, appear_embed=self.cfg_model.appear_embed,
            with_light=True, compute_dtype=self.compute_dtype,
        )

    # ------------------------------------------------------------------
    # Light-conditioned rendering
    # ------------------------------------------------------------------

    def render_rays(self, center, ray_unit, cond, pts_light=None, sample_idx=None,
                    stratified=False, rng=None, train: bool = True,
                    with_light_visibility: Optional[bool] = None):
        """Render rays conditioned on per-pixel light positions.

        pts_light: [B,R,3] light-source positions (one per pixel/ray).
        Returns the reference output dict (projects/NeuralLumen/model.py:232-336)
        incl. intrinsic components o_r/o_s/o_re per network mode and, when
        light visibility is on, visibility/normal_x_light/pseudo_shading maps.
        """
        assert pts_light is not None, "Lumen rendering requires pts_light"
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        cond = self._with_corner_key(cond, rng, train)
        k_obj, k_bg, k_vis = jax.random.split(rng, 3)
        near, far, outside = self.get_dist_bounds(center, ray_unit)
        app, app_outside = (
            self.get_appearance_embedding(sample_idx, ray_unit.shape[1])
            if sample_idx is not None and self.with_appear_embed
            else (None, None)
        )
        mode = self.rgb_network_mode
        out_obj = self.render_rays_object_lumen(
            center, ray_unit, pts_light, near, far, outside, app, cond, stratified, k_obj, train
        )
        intrinsic_keys = {
            "r_s": ("o_r", "o_s"),
            "r_s_re": ("o_r", "o_s", "o_re"),
            "rgb_r": ("o_r",),
            "rgb_r_s": ("o_r", "o_s"),
        }.get(mode, ())
        if self.with_background:
            if mode is not None:
                raise NotImplementedError("background + intrinsic modes not supported (as in reference)")
            out_bg = self.render_rays_background_lumen(
                center, ray_unit, pts_light, far, app_outside, cond, stratified, k_bg
            )
            rgbs = jnp.concatenate([out_obj["rgbs"], out_bg["rgbs"]], axis=-2)
            dists = jnp.concatenate([out_obj["dists"], out_bg["dists"]], axis=-2)
            alphas = jnp.concatenate([out_obj["alphas"], out_bg["alphas"]], axis=-1)
        else:
            rgbs, dists, alphas = out_obj["rgbs"], out_obj["dists"], out_obj["alphas"]
        weights = render.alpha_compositing_weights(alphas)
        opacity_all = render.composite_opacity(weights)

        intrinsic_accu: Dict[str, jnp.ndarray] = {}
        if mode in ("r_s", "r_s_re"):
            for key in intrinsic_keys:
                intrinsic_accu[key] = render.composite(out_obj[key], weights)
                if self.white_background:
                    intrinsic_accu[key] = intrinsic_accu[key] + (1 - opacity_all)
            rgb = intrinsic_accu["o_r"] * intrinsic_accu["o_s"]
            if mode == "r_s_re":
                rgb = rgb + intrinsic_accu["o_re"]
        elif mode == "rgb_r":
            rgb = render.composite(rgbs, weights)
            intrinsic_accu["o_r"] = render.composite(out_obj["o_r"], weights)
            if self.white_background:
                rgb = rgb + (1 - opacity_all)
                intrinsic_accu["o_r"] = intrinsic_accu["o_r"] + (1 - opacity_all)
            intrinsic_accu["o_s"] = rgb / intrinsic_accu["o_r"]
        elif mode == "rgb_r_s":
            rgb = render.composite(rgbs, weights)
            intrinsic_accu["o_r"] = render.composite(out_obj["o_r"], weights)
            intrinsic_accu["o_s"] = render.composite(out_obj["o_s"], weights)
            if self.white_background:
                rgb = rgb + (1 - opacity_all)
                intrinsic_accu["o_r"] = intrinsic_accu["o_r"] + (1 - opacity_all)
                intrinsic_accu["o_s"] = intrinsic_accu["o_s"] + (1 - opacity_all)
            intrinsic_accu["o_re"] = rgb - intrinsic_accu["o_r"] * intrinsic_accu["o_s"]
        else:
            rgb = render.composite(rgbs, weights)
            if self.white_background:
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
        output.update(intrinsic_accu)

        use_vis = self.flag_light_visibility if with_light_visibility is None else with_light_visibility
        if use_vis:
            visibility, normal_x_light, inter_dist, inter_mask = self.get_light_visibility(
                center, ray_unit, pts_light, near, far, outside, output, cond, stratified, k_vis
            )
            pseudo_shading = normal_x_light * visibility.astype(jnp.float32)
            if self.gamma_for_shading:
                pseudo_shading = jnp.power(pseudo_shading, 1.0 / self.gamma_for_shading)
            output.update(
                visibility=visibility,
                normal_x_light=normal_x_light,
                pseudo_shading=pseudo_shading,
                inter_dist=inter_dist,
                inter_mask=inter_mask,
            )
        return output

    def render_rays_object_lumen(self, center, ray_unit, pts_light, near, far, outside,
                                 app, cond, stratified, rng, train: bool):
        dists = self.sample_dists_all(center, ray_unit, near, far, cond, stratified, rng)
        points = camera.get_3D_points_from_dist(center, ray_unit, dists)
        sdfs, feats, gradients, hessians = self.eval_field_for_render(
            points, outside, cond, train, ray_unit, dists, far
        )
        rays_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
        normals = loss_lib.safe_normalize(gradients)
        pts_light_expand = jnp.broadcast_to(pts_light[..., None, :], points.shape)
        mode = self.rgb_network_mode
        heads = self.neural_rgb(points, normals, rays_unit, feats, pts_light_expand, app=app)
        out_heads: Dict[str, jnp.ndarray] = {}
        rgbs = None
        if mode == "r_s":
            out_heads["o_r"], out_heads["o_s"] = heads
        elif mode == "r_s_re":
            out_heads["o_r"], out_heads["o_s"], out_heads["o_re"] = heads
        elif mode == "rgb_r":
            rgbs, out_heads["o_r"] = heads
        elif mode == "rgb_r_s":
            rgbs, out_heads["o_r"], out_heads["o_s"] = heads
        else:
            rgbs = heads
        alphas = self.compute_neus_alphas(
            ray_unit, sdfs, gradients, dists, dist_far=far[..., None], progress=cond["progress"]
        )
        if not train:
            weights = render.alpha_compositing_weights(alphas)
            opacity = render.composite_opacity(weights)
            gradient = render.composite(gradients, weights)
        elif self.flag_light_visibility:
            weights = render.alpha_compositing_weights(alphas)
            opacity = None
            gradient = render.composite(gradients, weights)
        else:
            opacity = None
            gradient = None
        # In r_s/r_s_re modes there is no direct rgbs tensor; compositing uses
        # the head outputs. Fill with zeros to keep the output pytree static.
        if rgbs is None:
            rgbs = jnp.zeros_like(out_heads["o_r"])
        out = dict(
            rgbs=rgbs,
            sdfs=sdfs[..., 0],
            dists=dists,
            alphas=alphas,
            opacity=opacity,
            gradient=gradient,
            gradients=gradients,
            hessians=hessians,
        )
        out.update(out_heads)
        return out

    def render_rays_background_lumen(self, center, ray_unit, pts_light, far, app_outside,
                                     cond, stratified, rng):
        dists = self.sample_dists_background(ray_unit, far, stratified, rng)
        points = camera.get_3D_points_from_dist(center, ray_unit, dists)
        rays_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
        pts_light_expand = jnp.broadcast_to(pts_light[..., None, :], points.shape)
        rgbs, densities = self.background_nerf(points, rays_unit, pts_light_expand, app_outside)
        alphas = render.volume_rendering_alphas_dist(densities, dists)
        return dict(rgbs=rgbs, dists=dists, alphas=alphas)

    # ------------------------------------------------------------------
    # Light visibility (pseudo-label generation)
    # ------------------------------------------------------------------

    def get_dist_bounds_visibility(self, center, ray_unit):
        lv = self.para_light_visibility
        if lv.visibility_bounding_type == "box":
            aabb = np.asarray(lv.visibility_bounding_box_aabb, np.float32)
            return geometry.dist_bounds_aabb(center, ray_unit, aabb)
        return geometry.dist_bounds_sphere(center, ray_unit, radius=lv.visibility_sphere_radius)

    def get_light_visibility(self, center, ray_unit, pts_light, near, far, outside,
                             render_output, cond, stratified, rng):
        """Surface hit along the camera ray, then light-ray occlusion test.

        Reference: projects/NeuralLumen/model.py:133-230. All branches are
        config-static; device math is mask-based.
        """
        lv = self.para_light_visibility
        camera_ray_type = lv.camera_ray_type
        blend_dist = render.composite(render_output["dists"], render_output["weights"])
        if camera_ray_type == "blend_z_sphere_tracing":
            inter_dist, inter_pts, inter_mask = self.sphere_trace(
                center, ray_unit, near, far, cond, dist_start=jax.lax.stop_gradient(blend_dist)
            )
        elif camera_ray_type == "blend_z":
            inter_dist = jax.lax.stop_gradient(blend_dist)
            inter_pts = center + ray_unit * inter_dist
            inter_mask = inter_dist > 0.0
        elif camera_ray_type == "sphere_tracing":
            inter_dist, inter_pts, inter_mask = self.sphere_trace(center, ray_unit, near, far, cond)
        else:
            raise NotImplementedError(camera_ray_type)

        light_loc = pts_light
        light_ray = inter_pts - light_loc
        dists_light_inter = loss_lib.safe_norm(light_ray, axis=-1, keepdims=True)
        light_ray_unit = light_ray / dists_light_inter

        method = lv.type
        if method == "render_light_visibility":
            near_l, far_l, outside_l = self.get_dist_bounds(light_loc, light_ray_unit)
            inside_space = jnp.logical_and(~outside, ~outside_l)
            visibility = self.render_light_visibility(
                light_loc, light_ray_unit, near_l, far_l, outside_l, dists_light_inter,
                cond, stratified, rng,
            )
            visibility = jnp.logical_and(visibility > 0.5, inside_space)
        elif method == "sphere_tracing":
            near_l, far_l, outside_l = self.get_dist_bounds_visibility(light_loc, light_ray_unit)
            far_tracing = dists_light_inter - 1e-3
            inside_bounding = jnp.logical_and(near_l < far_tracing, far_tracing < far_l)
            inside_bounding = jnp.logical_and(inside_bounding, ~outside_l)
            _, _, mask_light = self.sphere_trace(light_loc, light_ray_unit, near_l, far_tracing, cond)
            visibility = jnp.logical_or(~mask_light, ~inside_bounding)
        else:
            raise NotImplementedError(method)

        normal_ray = -render_output["gradient"]
        normal_ray_unit = loss_lib.safe_normalize(normal_ray)
        normal_x_light = jnp.sum(normal_ray_unit * light_ray_unit, axis=-1, keepdims=True)
        normal_x_light = jax.nn.relu(normal_x_light)
        return visibility, normal_x_light, inter_dist, inter_mask

    def render_light_visibility(self, center, ray_unit, near, far, outside, dists_inter,
                                cond, stratified, rng):
        """Weight-peak-ratio visibility estimator (the alternative to sphere
        tracing): ratio of max compositing weight near the intersection to
        the global max along the light ray."""
        lv = self.para_light_visibility
        tol = int(lv.get("sample_tolerance", 4))
        dists = self.sample_dists_all(center, ray_unit, near, far, cond, stratified, rng)
        points = camera.get_3D_points_from_dist(center, ray_unit, dists)
        sdfs, _, gradients, _ = self.eval_field_with_gradients(
            points, outside, cond, train=False
        )
        alphas = self.compute_neus_alphas(
            ray_unit, sdfs, gradients, dists, dist_far=far[..., None], progress=cond["progress"]
        )
        weights = render.alpha_compositing_weights(alphas)[..., 0]  # [B,R,N]
        dist_index = samp.searchsorted_batched(dists[..., 0], dists_inter)  # [B,R,1]
        range_left = 1 - tol // 2
        range_right = 1 + tol // 2
        offsets = jnp.arange(range_left, range_right)
        indices = jnp.clip(dist_index + offsets[None, None, :], 0, weights.shape[-1] - 1)
        selected = jnp.take_along_axis(weights, indices, axis=-1)
        max_around = jnp.max(selected, axis=-1, keepdims=True)
        max_total = jnp.max(weights, axis=-1, keepdims=True)
        return max_around / (max_total + 1e-12)

    # ------------------------------------------------------------------
    # Entry points
    # ------------------------------------------------------------------

    def __call__(self, data, cond, rng, train: bool = True):
        """Training forward on pre-sampled rays with per-pixel light centers."""
        image_size = self.cfg_data.train.image_size
        center, ray = camera.get_center_and_ray(data["pose"], data["intr"], image_size)
        center = samp.slice_by_ray_idx(center, data["ray_idx"])
        ray = samp.slice_by_ray_idx(ray, data["ray_idx"])
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        # The light center is constant per image; broadcast per selected ray.
        light_center = camera.get_camera_center(data["pose_light"], num_pixels=1)  # [B,1,3]
        pts_light = jnp.broadcast_to(light_center, ray_unit.shape)
        return self.render_rays(
            center, ray_unit, cond, pts_light=pts_light,
            sample_idx=data["idx"] if self.with_appear_embed else None,
            stratified=self.cfg_render.stratified and train, rng=rng, train=train,
        )

    def render_chunk(self, center, ray, cond, pts_light=None, sample_idx=None, rng=None,
                     with_light_visibility=None):
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        out = self.render_rays(
            center, ray_unit, cond, pts_light=pts_light, sample_idx=sample_idx,
            stratified=False, rng=rng, train=False,
            with_light_visibility=with_light_visibility,
        )
        dist = render.composite(out["dists"], out["weights"])
        depth = dist / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        out["depth"] = depth
        return out
