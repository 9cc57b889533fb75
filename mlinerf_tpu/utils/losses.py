"""Loss functions for geometry and intrinsic decomposition (pure JAX).

Counterparts:
  * eikonal/curvature — projects/neuralangelo/utils/misc.py:74-89
  * weighted shading / intrinsic / residual regularizer —
    projects/NeuralLumen/utils/utils.py:126-174
  * L1 render loss x3 and online PSNR —
    projects/NeuralLumen/trainer.py:136-137
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def psnr(pred, target, eps=1e-12):
    return -10.0 * jnp.log10(mse_loss(pred, target) + eps)


def _nan_to_num(x):
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """L2 norm with well-defined (zero-ish) gradient at x == 0.

    ``jnp.linalg.norm`` back-propagates NaN at exactly zero — torch defines a
    zero subgradient there, and the reference's eikonal/normal math relies on
    that (SDF gradients are exactly zero in constant/outside regions).
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def safe_normalize(x, axis=-1, eps=1e-12):
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)


def eikonal_loss(gradients, outside=None):
    """(||grad sdf|| - 1)^2, masked to rays inside the bounding volume."""
    err = (safe_norm(gradients, axis=-1) - 1.0) ** 2  # [B,R,N]
    err = _nan_to_num(err)
    if outside is not None:
        inside = (~outside).astype(err.dtype)
        # Broadcast [B,R,1] mask over the samples axis.
        return jnp.mean(err * inside)
    return jnp.mean(err)


def curvature_loss(hessian, outside=None):
    """|trace of (diagonal) hessian| — Laplacian magnitude regularizer."""
    lap = jnp.abs(jnp.sum(hessian, axis=-1))  # [B,R,N]
    lap = _nan_to_num(lap)
    if outside is not None:
        inside = (~outside).astype(lap.dtype)
        return jnp.mean(lap * inside)
    return jnp.mean(lap)


def weighted_shading_loss(predicted_shading, pseudo_shading, weight_range=(0.0, 1.0)):
    """L1 on shading, weighted by (pseudo/0.5)^2 clamped — dims dark regions.

    The weight is stop-gradiented, as in the reference (utils.py:132).
    """
    threshold_high_probability = 0.5
    weight = jnp.clip(pseudo_shading / threshold_high_probability, 0.0, 1.0)
    weight = weight**2 * (weight_range[1] - weight_range[0]) + weight_range[0]
    weight = jax.lax.stop_gradient(weight)
    abs_diff = jnp.abs(predicted_shading - pseudo_shading)
    return jnp.mean(abs_diff * weight) / (jnp.mean(weight) + 1e-6)


def _normalize_range(x, lo, hi):
    x_min = jnp.min(x)
    x_max = jnp.max(x)
    return lo + (x - x_min) / jnp.clip(x_max - x_min, 1e-6, None) * (hi - lo)


def intrinsic_loss(
    output_ref,
    output_sha,
    pseudo_ref,
    pseudo_sha,
    pseudo_visibility_certainty,
    weight_map_range_shading=(0.25, 1.0),
    weight_map_range_visibility=(0.25, 1.0),
    factor_ref: float = 1.0,
    factor_sha: float = 1.0,
):
    """Pseudo-label supervision on reflectance and shading.

    Shading weight map = normalized pseudo shading; reflectance weight map =
    elementwise min of visibility-certainty and shading weight maps (pixels
    whose shading proxy is unreliable supervise reflectance less).
    """
    weight_map_sha = _normalize_range(jax.lax.stop_gradient(pseudo_sha), *weight_map_range_shading)
    weight_map_vis = _normalize_range(
        jax.lax.stop_gradient(pseudo_visibility_certainty), *weight_map_range_visibility
    )
    weight_map_ref = jnp.minimum(weight_map_vis, weight_map_sha)
    distance_l1_ref = jnp.mean(jnp.abs(output_ref - pseudo_ref) * weight_map_ref)
    distance_l1_sha = jnp.mean(jnp.abs(output_sha - pseudo_sha) * weight_map_sha)
    return distance_l1_ref * factor_ref + distance_l1_sha * factor_sha


def regularize_re_loss(output_re, factor_negative=10.0, factor_positive=1.0, exponent_positive=1.0):
    """Penalize negative residual strongly; keep positive residual area small."""
    part_negative = jnp.where(output_re < 0.0, output_re, 0.0)
    reg_negative = jnp.mean(jnp.abs(part_negative))
    part_positive = jnp.where(output_re >= 0.0, output_re, 0.0)
    reg_positive = jnp.mean(part_positive**exponent_positive)
    return reg_negative * factor_negative + reg_positive * factor_positive
