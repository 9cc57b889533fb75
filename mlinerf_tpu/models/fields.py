"""Neural fields: SDF, radiance heads, background NeRF, and the multi-light
LumenRGB head bank (flax.linen).

Counterparts:
  * NeuralSDF / NeuralRGB / BackgroundNeRF —
    projects/neuralangelo/utils/modules.py:24-311
  * LumenRGB / LumenBackgroundNeRF —
    projects/NeuralLumen/utils/modules.py:9-265

TPU-first design decisions:
  * the hash encoder is the flat-table gather op from ``ops.hashgrid`` (no
    external CUDA); coarse-to-fine enters as a traced [L] mask;
  * numerical SDF gradients batch all taps into ONE extra field evaluation of
    shape [..., taps, 3] instead of `taps` separate calls, keeping the gather
    and matmul shapes large for the MXU;
  * all sub-MLP hidden activations may run in bf16; SDF values, gradients and
    compositing stay fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.models.mlp import MLPforNeuralSDF, MLPwithSkipConnection
from mlinerf_tpu.ops import hashgrid
from mlinerf_tpu.utils import encoding as enc
from mlinerf_tpu.utils.misc import get_activation


def make_hashgrid_spec(cfg_encoding) -> hashgrid.HashGridSpec:
    hg = cfg_encoding.hashgrid
    return hashgrid.HashGridSpec(
        num_levels=cfg_encoding.levels,
        features_per_level=hg.dim,
        log2_hashmap_size=hg.dict_size,
        min_logres=hg.min_logres,
        max_logres=hg.max_logres,
        range_min=float(hg.range[0]),
        range_max=float(hg.range[1]),
        # bf16 tables halve gather/scatter HBM traffic (tcnn stores fp16);
        # fp32 remains the default.
        dtype=hg.get("dtype", "float32") if hasattr(hg, "get") else "float32",
    )


class NeuralSDF(nn.Module):
    """Hash-grid (or Fourier) encoded SDF with pointwise feature output."""

    cfg_sdf: Any  # model.object.sdf config subtree
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg_enc = self.cfg_sdf.encoding
        if cfg_enc.type == "hashgrid":
            self.spec = make_hashgrid_spec(cfg_enc)
            self.table = self.param(
                "hash_table",
                lambda key: hashgrid.init_params(key, self.spec),
            )
            encoding_dim = self.spec.output_dim
        elif cfg_enc.type == "fourier":
            self.spec = None
            encoding_dim = 6 * cfg_enc.levels
        else:
            raise NotImplementedError(f"Unknown encoding type {cfg_enc.type}")
        cfg_mlp = self.cfg_sdf.mlp
        layer_dims = [3 + encoding_dim] + [cfg_mlp.hidden_dim] * cfg_mlp.num_layers + [cfg_mlp.hidden_dim]
        self.mlp = MLPforNeuralSDF(
            layer_dims=tuple(layer_dims),
            skip_connection=tuple(cfg_mlp.skip),
            activ=get_activation(cfg_mlp.activ, **dict(cfg_mlp.get("activ_params", {}))),
            use_weightnorm=cfg_mlp.weight_norm,
            geometric_init=cfg_mlp.geometric_init,
            out_bias=cfg_mlp.out_bias,
            invert=cfg_mlp.get("inside_out", False),
            compute_dtype=self.compute_dtype,
        )

    def _pallas_backward(self) -> bool:
        # custom_vjp is reverse-mode-only: the analytical-gradient mode
        # double-differentiates the encoder and must keep the plain XLA path.
        grad_cfg = self.cfg_sdf.get("gradient", {}) or {}
        mode = grad_cfg.get("mode", "numerical") if hasattr(grad_cfg, "get") else "numerical"
        return mode != "analytical"

    def _corner_opts(self):
        grad_cfg = self.cfg_sdf.get("gradient", {}) or {}
        cs = grad_cfg.get("corner_sample", {}) or {}
        return (float(cs.get("floor", 0.125)), int(cs.get("corners", 1)),
                str(cs.get("mode", "cotangent")),
                int(cs.get("exact_finest", 0)))

    def encode(self, points_3D, level_mask=None, max_levels=None, corner_key=None):
        cfg_enc = self.cfg_sdf.encoding
        if cfg_enc.type == "hashgrid":
            floor, k, mode, exact_finest = self._corner_opts()
            feats = hashgrid.encode(self.table, points_3D, self.spec,
                                    level_mask=level_mask, max_levels=max_levels,
                                    pallas_backward=self._pallas_backward(),
                                    corner_key=corner_key,
                                    corner_floor=floor, corner_k=k,
                                    corner_mode=mode,
                                    corner_exact_finest=exact_finest,
                                    dense_blocked=bool(
                                        cfg_enc.hashgrid.get("dense_blocked", False)))
        else:
            feats = enc.positional_encoding(points_3D, cfg_enc.levels)
            if level_mask is not None:
                # Mask whole frequency bands (6 dims per level).
                mask = jnp.repeat(level_mask, 6)
                feats = feats * mask
        return jnp.concatenate([points_3D, feats.astype(points_3D.dtype)], axis=-1)

    def __call__(self, points_3D, level_mask=None, with_sdf=True, with_feat=True,
                 max_levels=None, corner_key=None):
        points_enc = self.encode(points_3D, level_mask=level_mask, max_levels=max_levels,
                                 corner_key=corner_key)
        sdf, feat = self.mlp(points_enc, with_sdf=with_sdf, with_feat=with_feat)
        return sdf, feat

    def sdf(self, points_3D, level_mask=None, max_levels=None, corner_key=None):
        return self(points_3D, level_mask=level_mask, with_sdf=True, with_feat=False,
                    max_levels=max_levels, corner_key=corner_key)[0]

    def stencil(self, points_3D, offsets, level_mask=None, shared_levels=0,
                max_levels=None, corner_key=None):
        """Evaluate SDF at center + tap points with shared coarse-level gathers.

        Fuses the center evaluation (SDF + feature head) and the ``T``
        numerical-gradient tap evaluations (SDF only) into one encoder pass:
        levels below ``shared_levels`` gather their 8 cell corners ONCE for
        all 1+T points (see ops/hashgrid.encode_stencil — this collapses the
        scatter-add rows that dominate the TPU step). Exact for taps that stay
        within the center's cell at a shared level; linear extrapolation of
        the cell patch otherwise.

        Returns:
            (sdf_center [..., 1], feat_center [..., W], sdf_taps [..., T])
        """
        cfg_enc = self.cfg_sdf.encoding
        if cfg_enc.type != "hashgrid":
            raise NotImplementedError("stencil sharing requires the hashgrid encoder")
        floor, k, mode, exact_finest = self._corner_opts()
        feats = hashgrid.encode_stencil(
            self.table, points_3D, offsets, self.spec, level_mask=level_mask,
            shared_levels=shared_levels, max_levels=max_levels,
            pallas_backward=self._pallas_backward(),
            corner_key=corner_key, corner_floor=floor, corner_k=k,
            corner_mode=mode, corner_exact_finest=exact_finest,
            dense_blocked=bool(cfg_enc.hashgrid.get("dense_blocked", False)),
        )  # [..., 1+T, L*F]
        offs_all = jnp.concatenate(
            [jnp.zeros((1, 3), jnp.float32), offsets.astype(jnp.float32)], axis=0
        )
        pts_all = points_3D[..., None, :] + offs_all  # [..., 1+T, 3]
        enc_all = jnp.concatenate([pts_all, feats.astype(pts_all.dtype)], axis=-1)
        sdf_center, feat_center = self.mlp(enc_all[..., 0, :], with_sdf=True, with_feat=True)
        sdf_taps, _ = self.mlp(enc_all[..., 1:, :], with_sdf=True, with_feat=False)
        return sdf_center, feat_center, sdf_taps[..., 0]


def numerical_gradient_taps(taps: int, eps):
    """Static tap offset matrix [taps, 3] scaled by eps (traced scalar ok).

    taps=6: central differences along +-x/+-y/+-z with step eps.
    taps=4: tetrahedral stencil with step eps/sqrt(3).
    """
    if taps == 6:
        k = np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            np.float32,
        )
        return jnp.asarray(k) * eps
    if taps == 4:
        k = np.array([[1, -1, -1], [-1, -1, 1], [-1, 1, -1], [1, 1, 1]], np.float32)
        return jnp.asarray(k) * (eps / np.sqrt(3))
    raise ValueError("Only 4 or 6 taps supported")


def numerical_gradients(sdf_tap_values, sdf_center, taps: int, eps, training: bool):
    """Assemble gradient (and diagonal hessian) from batched tap SDF values.

    Args:
        sdf_tap_values: [..., taps] SDF at the tap points.
        sdf_center: [..., 1] SDF at the center (needed for the hessian).
        eps: traced scalar step (the reference's ``normal_eps``).
    Returns:
        (gradient [...,3], hessian [...,3] or None).
    """
    s = sdf_tap_values
    if taps == 6:
        gx = (s[..., 0] - s[..., 1]) / (2 * eps)
        gy = (s[..., 2] - s[..., 3]) / (2 * eps)
        gz = (s[..., 4] - s[..., 5]) / (2 * eps)
        gradient = jnp.stack([gx, gy, gz], axis=-1)
        hessian = None
        if training:
            c = sdf_center[..., 0]
            hxx = (s[..., 0] + s[..., 1] - 2 * c) / eps**2
            hyy = (s[..., 2] + s[..., 3] - 2 * c) / eps**2
            hzz = (s[..., 4] + s[..., 5] - 2 * c) / eps**2
            hessian = jnp.stack([hxx, hyy, hzz], axis=-1)
        return gradient, hessian
    if taps == 4:
        eps4 = eps / np.sqrt(3)
        k = jnp.asarray(
            np.array([[1, -1, -1], [-1, -1, 1], [-1, 1, -1], [1, 1, 1]], np.float32)
        )
        gradient = jnp.einsum("...t,td->...d", s, k) / (4.0 * eps4)
        hessian = None
        if training:
            c = sdf_center[..., 0]
            hxx = (jnp.sum(s, axis=-1) / 2.0 - 2 * c) / eps4**2
            hessian = jnp.stack([hxx, hxx, hxx], axis=-1) / 3.0
        return gradient, hessian
    raise ValueError("Only 4 or 6 taps supported")


class NeuralRGB(nn.Module):
    """IDR-style view-dependent radiance head (stage-less Neuralangelo)."""

    cfg_rgb: Any
    feat_dim: int
    appear_embed: Any
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg_mlp = self.cfg_rgb.mlp
        view_dim = self._view_dim()
        input_base_dim = 6 if self.cfg_rgb.mode == "idr" else 3
        app_dim = self.appear_embed.dim if self.appear_embed.enabled else 0
        input_dim = input_base_dim + view_dim + self.feat_dim + app_dim
        self.mlp = MLPwithSkipConnection(
            layer_dims=tuple([input_dim] + [cfg_mlp.hidden_dim] * cfg_mlp.num_layers + [3]),
            skip_connection=tuple(cfg_mlp.skip),
            activ=get_activation(cfg_mlp.activ, **dict(cfg_mlp.get("activ_params", {}))),
            use_weightnorm=cfg_mlp.weight_norm,
            compute_dtype=self.compute_dtype,
        )

    def _view_dim(self):
        cfg_view = self.cfg_rgb.encoding_view
        if cfg_view.type == "fourier":
            return 6 * cfg_view.levels
        if cfg_view.type == "spherical":
            return (cfg_view.levels + 1) ** 2
        raise NotImplementedError

    def encode_view(self, rays_unit):
        cfg_view = self.cfg_rgb.encoding_view
        if cfg_view.type == "fourier":
            return enc.positional_encoding(rays_unit, cfg_view.levels)
        return enc.spherical_harmonics(rays_unit, cfg_view.levels)

    def __call__(self, points_3D, normals, rays_unit, feats, app=None):
        view_enc = self.encode_view(rays_unit)
        inputs = [points_3D, view_enc, normals, feats]
        if app is not None:
            inputs.append(app)
        if self.cfg_rgb.mode == "no_view_dir":
            inputs.remove(view_enc)
        if self.cfg_rgb.mode == "no_normal":
            inputs.remove(normals)
        x = jnp.concatenate([i.astype(self.compute_dtype) for i in inputs], axis=-1)
        rgb = jax.nn.sigmoid(self.mlp(x).astype(jnp.float32))
        return rgb


class BackgroundNeRF(nn.Module):
    """Inverse-sphere background NeRF (NeRF++-style 4D reparametrization)."""

    cfg_background: Any
    appear_embed: Any
    with_light: bool = False  # LumenBackgroundNeRF: condition RGB on light pos
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg_mlp = self.cfg_background.mlp
        pos_dim = 8 * self.cfg_background.encoding.levels
        view_dim = self._view_dim()
        app_dim = self.appear_embed.dim if self.appear_embed.enabled else 0
        input_dim = 4 + pos_dim
        n_view_feats = 2 if self.with_light else 1
        input_view_dim = cfg_mlp.hidden_dim + view_dim * n_view_feats + app_dim
        self.mlp_feat = MLPwithSkipConnection(
            layer_dims=tuple(
                [input_dim] + [cfg_mlp.hidden_dim] * (cfg_mlp.num_layers - 1) + [cfg_mlp.hidden_dim + 1]
            ),
            skip_connection=tuple(cfg_mlp.skip),
            activ=get_activation(cfg_mlp.activ, **dict(cfg_mlp.get("activ_params", {}))),
            compute_dtype=self.compute_dtype,
        )
        self.mlp_rgb = MLPwithSkipConnection(
            layer_dims=tuple(
                [input_view_dim] + [cfg_mlp.hidden_dim_rgb] * (cfg_mlp.num_layers_rgb - 1) + [3]
            ),
            skip_connection=tuple(cfg_mlp.skip_rgb),
            activ=get_activation(cfg_mlp.activ, **dict(cfg_mlp.get("activ_params", {}))),
            compute_dtype=self.compute_dtype,
        )
        self.activ = get_activation(cfg_mlp.activ, **dict(cfg_mlp.get("activ_params", {})))
        self.activ_density = get_activation(
            cfg_mlp.activ_density, **dict(cfg_mlp.get("activ_density_params", {}))
        )

    def _view_dim(self):
        cfg_view = self.cfg_background.encoding_view
        if cfg_view.type == "fourier":
            return 6 * cfg_view.levels
        if cfg_view.type == "spherical":
            return (cfg_view.levels + 1) ** 2
        raise NotImplementedError

    def encode(self, points_3D):
        norm = jnp.linalg.norm(points_3D, axis=-1, keepdims=True)
        points = jnp.concatenate([points_3D / norm, 1.0 / norm], axis=-1)  # [...,4]
        points_enc = enc.positional_encoding(points, self.cfg_background.encoding.levels)
        return jnp.concatenate([points, points_enc], axis=-1)

    def encode_view(self, rays_unit):
        cfg_view = self.cfg_background.encoding_view
        if cfg_view.type == "fourier":
            return enc.positional_encoding(rays_unit, cfg_view.levels)
        return enc.spherical_harmonics(rays_unit, cfg_view.levels)

    def __call__(self, points_3D, rays_unit, pts_light=None, app_outside=None):
        points_enc = self.encode(points_3D).astype(self.compute_dtype)
        out = self.mlp_feat(points_enc)
        density = self.activ_density(out[..., 0].astype(jnp.float32))
        feat = self.activ(out[..., 1:])
        inputs = [feat, self.encode_view(rays_unit).astype(self.compute_dtype)]
        if self.with_light:
            inputs.append(self.encode_view(pts_light).astype(self.compute_dtype))
        if app_outside is not None:
            inputs.append(app_outside.astype(self.compute_dtype))
        x = jnp.concatenate(inputs, axis=-1)
        rgb = jax.nn.sigmoid(self.mlp_rgb(x).astype(jnp.float32))
        return rgb, density


class LumenRGB(nn.Module):
    """Light-conditioned radiance head bank with 4 intrinsic network modes.

    Modes (projects/NeuralLumen/utils/modules.py:106-174):
      * 'rgb'     — single light-conditioned RGB MLP
      * 'r_s'     — reflectance (light-free) + shading heads; rgb = R*S
      * 'r_s_re'  — + residual head; rgb = R*S + Re
      * 'rgb_r'   — rgb + reflectance; S = rgb/R
      * 'rgb_r_s' — rgb + reflectance + shading; Re = rgb - R*S
    The light position is encoded with the *view* encoder (SH), as in the
    reference.
    """

    cfg_rgb: Any
    feat_dim: int
    appear_embed: Any
    compute_dtype: Any = jnp.float32

    def setup(self):
        cfg_mlp = self.cfg_rgb.mlp
        self.network_mode = self.cfg_rgb.get("network_mode") or "rgb"
        view_dim = self._view_dim()
        app_dim = self.appear_embed.dim if self.appear_embed.enabled else 0
        p, v, n, f, l = 3, view_dim, 3, self.feat_dim, view_dim

        def head(in_dim, out_dim, name):
            return MLPwithSkipConnection(
                layer_dims=tuple([in_dim] + [cfg_mlp.hidden_dim] * cfg_mlp.num_layers + [out_dim]),
                skip_connection=tuple(cfg_mlp.skip),
                activ=get_activation(cfg_mlp.activ, **dict(cfg_mlp.get("activ_params", {}))),
                use_weightnorm=cfg_mlp.weight_norm,
                compute_dtype=self.compute_dtype,
                name=name,
            )

        mode = self.network_mode
        if mode == "r_s":
            self.mlp_r = head(p + n + f + app_dim, 3, "mlp_r")
            self.mlp_s = head(p + v + n + f + l + app_dim, 3, "mlp_s")
        elif mode == "r_s_re":
            self.mlp_r = head(p + n + f + app_dim, 3, "mlp_r")
            self.mlp_s = head(p + n + f + l + app_dim, 3, "mlp_s")
            self.mlp_re = head(p + v + n + f + l + app_dim, 3, "mlp_re")
        elif mode == "rgb_r":
            self.mlp = head(p + v + n + f + l + app_dim, 3, "mlp")
            self.mlp_r = head(p + n + f + app_dim, 3, "mlp_r")
        elif mode == "rgb_r_s":
            shading_dim = self.cfg_rgb.get("shading_dim", 3)
            self.mlp = head(p + v + n + f + l + app_dim, 3, "mlp")
            self.mlp_r = head(p + n + f + app_dim, 3, "mlp_r")
            self.mlp_s = head(p + n + f + l + app_dim, shading_dim, "mlp_s")
        else:  # plain light-conditioned rgb
            base = 6 if self.cfg_rgb.get("mode") == "idr" else 3
            self.mlp = head(base + 2 * view_dim + f + app_dim, 3, "mlp")

    def _view_dim(self):
        cfg_view = self.cfg_rgb.encoding_view
        if cfg_view.type == "fourier":
            return 6 * cfg_view.levels
        if cfg_view.type == "spherical":
            return (cfg_view.levels + 1) ** 2
        raise NotImplementedError

    def encode_view(self, rays_unit):
        cfg_view = self.cfg_rgb.encoding_view
        if cfg_view.type == "fourier":
            return enc.positional_encoding(rays_unit, cfg_view.levels)
        return enc.spherical_harmonics(rays_unit, cfg_view.levels)

    def __call__(self, points_3D, normals, rays_unit, feats, pts_light, app=None):
        dt = self.compute_dtype
        view_enc = self.encode_view(rays_unit).astype(dt)
        light_enc = self.encode_view(pts_light).astype(dt)
        p = points_3D.astype(dt)
        n = normals.astype(dt)
        f = feats.astype(dt)
        extra = [app.astype(dt)] if app is not None else []

        def cat(parts):
            return jnp.concatenate(parts + extra, axis=-1)

        sig = lambda x: jax.nn.sigmoid(x.astype(jnp.float32))
        mode = self.network_mode
        if mode == "r_s":
            o_r = sig(self.mlp_r(cat([p, n, f])))
            o_s = self.mlp_s(cat([p, view_enc, n, f, light_enc])).astype(jnp.float32)
            return o_r, o_s
        if mode == "r_s_re":
            o_r = sig(self.mlp_r(cat([p, n, f])))
            o_s = sig(self.mlp_s(cat([p, n, f, light_enc])))
            o_re = sig(self.mlp_re(cat([p, view_enc, n, f, light_enc])))
            return o_r, o_s, o_re
        if mode == "rgb_r":
            rgb = sig(self.mlp(cat([p, view_enc, n, f, light_enc])))
            o_r = sig(self.mlp_r(cat([p, n, f])))
            return rgb, o_r
        if mode == "rgb_r_s":
            rgb = sig(self.mlp(cat([p, view_enc, n, f, light_enc])))
            o_r = sig(self.mlp_r(cat([p, n, f])))
            o_s = sig(self.mlp_s(cat([p, n, f, light_enc])))
            return rgb, o_r, o_s
        # plain light-conditioned rgb
        inputs = [p, view_enc, n, f, light_enc]
        if self.cfg_rgb.get("mode") == "no_view_dir":
            inputs.remove(view_enc)
        if self.cfg_rgb.get("mode") == "no_normal":
            inputs.remove(n)
        rgb = sig(self.mlp(cat(inputs)))
        return rgb
