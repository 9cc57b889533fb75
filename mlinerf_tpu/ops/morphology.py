"""Binary morphology on images (pure JAX, ``lax.reduce_window``).

Counterpart of the conv-based erosion/dilation/edge helpers in the
reference pseudo-label pipeline (projects/NeuralLumen/scripts/
pseudo_label.py:27-54). On TPU these map to windowed reductions on the VPU.

Layout: [..., H, W] float images with values ~ {0, 1}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_reduce(x, kernel_size: int, init, op):
    pad = kernel_size // 2
    nd = x.ndim
    window = (1,) * (nd - 2) + (kernel_size, kernel_size)
    strides = (1,) * nd
    padding = ((0, 0),) * (nd - 2) + (((pad, pad),) * 2)
    return jax.lax.reduce_window(x, init, op, window, strides, padding)


def erosion(x, kernel_size: int):
    """1 where EVERY pixel in the k x k window is 1 (replicate-pad edges).

    The reference pads with 'replicate' then requires the window sum to equal
    k^2; min-reduction with edge replication is the same operation.
    """
    pad = kernel_size // 2
    nd = x.ndim
    x_pad = jnp.pad(x, [(0, 0)] * (nd - 2) + [(pad, pad), (pad, pad)], mode="edge")
    window = (1,) * (nd - 2) + (kernel_size, kernel_size)
    strides = (1,) * nd
    padding = ((0, 0),) * nd
    out = jax.lax.reduce_window(x_pad, jnp.inf, jax.lax.min, window, strides, padding)
    return jnp.where(out >= 1.0, 1.0, 0.0)


def dilation(x, kernel_size: int):
    return 1.0 - erosion(1.0 - x, kernel_size)


def edge(x, kernel_size: int):
    return dilation(x, kernel_size) - erosion(x, kernel_size)


def edge_weight(x, step: int):
    """Multi-scale edge accumulation -> certainty weight in [0,1].

    Pixels near visibility boundaries (where the geometry-derived visibility
    is unreliable) get low weight (reference: pseudo_label.py:47-54).
    """
    weight = jnp.zeros_like(x)
    for i in range(1, step + 1):
        weight = weight + edge(x, 2 * i + 1)
    m = jnp.max(weight)
    weight = jnp.where(m > 0.0, weight / jnp.where(m > 0, m, 1.0), weight)
    return 1.0 - weight
