"""Batched k-means as a jitted XLA loop (Lloyd's algorithm).

Replaces the reference's external GPU ``torch_kmeans`` dependency
(projects/NeuralLumen/scripts/pseudo_label.py:96-122). The distance matrix
is one [N, K] matmul-shaped computation per iteration — MXU-friendly —
with a fixed iteration count (``lax.fori_loop``), so the whole clustering
jits into a single program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 2))
def kmeans(points, num_clusters: int, num_iters: int = 25, key=None):
    """Cluster points [N, D] into K clusters.

    Returns (labels [N] int32, centers [K, D]). Initialization: k-means++-
    style greedy farthest seeding (deterministic from `key`).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    N, D = points.shape
    # --- init: first center random, rest = farthest point from current set.
    first = jax.random.randint(key, (), 0, N)
    centers0 = jnp.zeros((num_clusters, D), points.dtype).at[0].set(points[first])

    def seed_body(i, centers):
        d2 = jnp.min(
            jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(num_clusters)[None, :] >= i, jnp.inf, 0.0),
            axis=-1,
        )
        idx = jnp.argmax(d2)
        return centers.at[i].set(points[idx])

    centers0 = jax.lax.fori_loop(1, num_clusters, seed_body, centers0)

    def lloyd_body(_, centers):
        d2 = (
            jnp.sum(points**2, axis=-1, keepdims=True)
            - 2 * points @ centers.T
            + jnp.sum(centers**2, axis=-1)[None, :]
        )  # [N,K]
        labels = jnp.argmin(d2, axis=-1)
        one_hot = jax.nn.one_hot(labels, num_clusters, dtype=points.dtype)  # [N,K]
        sums = one_hot.T @ points  # [K,D]
        counts = jnp.sum(one_hot, axis=0)[:, None]  # [K,1]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        return new_centers

    centers = jax.lax.fori_loop(0, num_iters, lloyd_body, centers0)
    d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    labels = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    return labels, centers


def kmeans_per_pixel(vectors, num_clusters: int, num_iters: int = 25, key=None):
    """Cluster per-pixel multi-light vectors: [P, L, D] -> labels [P, L].

    Each pixel is an independent clustering problem (the reference's
    torch_kmeans batch dim). vmapped Lloyd's: all pixels solve in parallel.
    """
    if num_clusters == 1:
        P, L, D = vectors.shape
        labels = jnp.zeros((P, L), jnp.int32)
        centers = jnp.mean(vectors, axis=1, keepdims=True)
        return labels, centers
    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, vectors.shape[0])
    fn = jax.vmap(lambda pts, k: kmeans(pts, num_clusters, num_iters, k))
    return fn(vectors, keys)
