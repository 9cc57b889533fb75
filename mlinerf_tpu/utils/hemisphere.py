"""Fibonacci-spiral hemisphere ray sampling + square unwrapping.

Counterpart of ``projects/neuralangelo/utils/semi_sphere.py``: evenly
distributed hemisphere directions (golden-angle spiral), a nearest-neighbor
index mapping the spiral onto a square image for visualization, and a
Rodrigues rotation aligning +z with arbitrary surface normals — used by the
indirect-light probe renders (``render_image_light``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def hemisphere_spiral(N: int) -> np.ndarray:
    """N unit vectors evenly covering the +z hemisphere (spiral method)."""
    indices = np.arange(N, dtype=np.float64) / 2.0  # half sphere
    phi = np.pi * (5.0**0.5 - 1.0)  # golden angle
    lat = np.arccos(np.clip(1 - 2 * indices / (N - 1), -1, 1))
    lon = indices * phi
    x = np.sin(lat) * np.cos(lon)
    y = np.sin(lat) * np.sin(lon)
    z = np.cos(lat)
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def square_interpolation(N: int) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """Nearest-neighbor unwrap of the spiral onto a sqrt(N) x sqrt(N) square.

    Returns (index [S*S] into the spiral points, mask [S*S] of pixels inside
    the projected disc, (S, S)).
    """
    indices = np.arange(N, dtype=np.float64) / 2.0
    phi = np.pi * (5.0**0.5 - 1.0)
    lat = np.arccos(np.clip(1 - 2 * indices / (N - 1), -1, 1))
    lon = indices * phi
    S = int(N**0.5)
    px = lat * np.cos(lon)
    py = lat * np.sin(lon)
    radius_max = lat.max()
    gx = np.linspace(px.min(), px.max(), S)
    gy = np.linspace(py.max(), py.min(), S)
    GX, GY = np.meshgrid(gx, gy, indexing="ij")
    fx, fy = GX.ravel(), GY.ravel()
    d2 = (px[:, None] - fx[None, :]) ** 2 + (py[:, None] - fy[None, :]) ** 2
    index = np.argmin(d2, axis=0)
    mask = np.sqrt(fx**2 + fy**2) < radius_max
    return index.astype(np.int64), mask, (S, S)


def rotation_from_z(v):
    """Rotation matrices aligning +z with each unit vector v [...,3].

    Rodrigues' formula with parallel/antiparallel special cases; JAX-traced.
    """
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    z = jnp.asarray([0.0, 0.0, 1.0])
    axis = jnp.cross(jnp.broadcast_to(z, v.shape), v)
    axis_norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), v.shape)
    axis = jnp.where(axis_norm > 1e-12, axis / jnp.where(axis_norm > 0, axis_norm, 1.0), fallback)
    zeros = jnp.zeros(v.shape[:-1])
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    skew = jnp.stack(
        [
            jnp.stack([zeros, -az, ay], axis=-1),
            jnp.stack([az, zeros, -ax], axis=-1),
            jnp.stack([-ay, ax, zeros], axis=-1),
        ],
        axis=-2,
    )
    cos_a = jnp.clip(v[..., 2], -1.0, 1.0)
    angle = jnp.arccos(cos_a)
    eye = jnp.broadcast_to(jnp.eye(3), skew.shape)
    R = eye + skew * jnp.sin(angle)[..., None, None] + (skew @ skew) * (1 - jnp.cos(angle))[..., None, None]
    # parallel: identity; antiparallel: 180deg about x.
    R_anti = jnp.broadcast_to(jnp.diag(jnp.asarray([1.0, -1.0, -1.0])), skew.shape)
    R = jnp.where((cos_a >= 1.0)[..., None, None], eye, R)
    R = jnp.where((cos_a <= -1.0)[..., None, None], R_anti, R)
    return R
