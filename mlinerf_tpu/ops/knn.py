"""Brute-force nearest-neighbor feature matching on device.

Replaces the scipy KDTree hole-filling of the reference pseudo-label
pipeline (projects/NeuralLumen/scripts/pseudo_label.py:210-282). Image-scale
problems (<= 512^2 pixels) make the O(holes x non-holes) distance matrix a
single MXU matmul per tile — faster end-to-end than host KD-trees and
differentiably composable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2,))
def nearest_neighbor(queries, database, chunk: int = 4096):
    """For each query row return the index of its nearest database row (L2).

    Args:
        queries: [Q, D]; database: [N, D].
    Returns:
        idx [Q] int32, dist [Q] float32 (squared distances).
    """
    db_sq = jnp.sum(database**2, axis=-1)  # [N]

    def process(q):
        d2 = jnp.sum(q**2, axis=-1, keepdims=True) - 2 * q @ database.T + db_sq[None, :]
        return jnp.argmin(d2, axis=-1).astype(jnp.int32), jnp.min(d2, axis=-1)

    Q = queries.shape[0]
    if Q <= chunk:
        return process(queries)
    pad = (-Q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qp = qp.reshape(-1, chunk, queries.shape[-1])
    idx, dist = jax.lax.map(process, qp)
    return idx.reshape(-1)[:Q], dist.reshape(-1)[:Q]


def masked_nearest_fill(values, features, valid_mask, fill_weight: float = 1e6):
    """Replace values at invalid pixels with the value of the nearest valid
    pixel in feature space.

    Static-shape version of KD-tree hole fill: ALL pixels participate; the
    distance to invalid database pixels is pushed to +inf via a mask term, so
    no dynamic gather/boolean indexing is needed.

    Args:
        values: [P, C] per-pixel values to fill.
        features: [P, D] matching features (position+normal+color, weighted).
        valid_mask: [P] bool — True where the value is trustworthy.
    Returns:
        filled values [P, C].
    """
    db_sq = jnp.sum(features**2, axis=-1)
    penalty = jnp.where(valid_mask, 0.0, fill_weight)  # invalid db rows -> far

    def process(q):
        d2 = (
            jnp.sum(q**2, axis=-1, keepdims=True)
            - 2 * q @ features.T
            + db_sq[None, :]
            + penalty[None, :]
        )
        return jnp.argmin(d2, axis=-1)

    chunk = 2048
    P = features.shape[0]
    pad = (-P) % chunk
    qp = jnp.pad(features, ((0, pad), (0, 0))).reshape(-1, chunk, features.shape[-1])
    nn_idx = jax.lax.map(process, qp).reshape(-1)[:P]
    nearest_vals = jnp.take(values, nn_idx, axis=0)
    return jnp.where(valid_mask[:, None], values, nearest_vals)
