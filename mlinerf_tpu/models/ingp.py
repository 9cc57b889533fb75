"""Instant-NGP variant of vanilla NeRF: hash-grid 3D encoding.

Counterpart of ``projects/nerf/models/ingp.py`` — same rendering loop as the
NeRF model but ``_encode_3D`` is the multiresolution hash encoder (the
reference delegates to ``tcnn.Encoding``; here it's ``ops.hashgrid``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from mlinerf_tpu.config import register
from mlinerf_tpu.models import nerf as nerf_model
from mlinerf_tpu.ops import hashgrid


class INGPField(nerf_model.NeRFField):
    """NeRF field with a hash-grid positional encoding."""

    def setup(self):
        cfg = self.cfg_model
        hg = cfg.posenc.get("hashgrid")
        self.spec = hashgrid.HashGridSpec(
            num_levels=hg.get("levels", 16),
            features_per_level=hg.get("dim", 2),
            log2_hashmap_size=hg.get("dict_size", 19),
            min_logres=hg.get("min_logres", 4),
            max_logres=hg.get("max_logres", 11),
            range_min=float(hg.get("range", [-1, 1])[0]),
            range_max=float(hg.get("range", [-1, 1])[1]),
        )
        self.table = self.param("hash_table", lambda key: hashgrid.init_params(key, self.spec))
        self._input_3D_dim = 3 + self.spec.output_dim
        # Build MLPs with the hash-encoded input width.
        from mlinerf_tpu.models.mlp import MLPwithSkipConnection
        from mlinerf_tpu.utils.misc import get_activation

        layers_feat = list(cfg.mlp.layers_feat)
        layers_feat[0] = self._input_3D_dim
        layers_feat[-1] += 1
        self.mlp_feat = MLPwithSkipConnection(
            layer_dims=tuple(layers_feat), skip_connection=tuple(cfg.mlp.skip),
            compute_dtype=self.compute_dtype,
        )
        layers_rgb = list(cfg.mlp.layers_rgb)
        self.view_dep = cfg.view_dep
        self.L_3D = None
        self.L_view = cfg.posenc.L_view
        input_view_dim = (3 + 6 * self.L_view if self.L_view else 3) if cfg.view_dep else 0
        layers_rgb[0] = cfg.mlp.layers_feat[-1] + input_view_dim
        self.mlp_rgb = MLPwithSkipConnection(
            layer_dims=tuple(layers_rgb), compute_dtype=self.compute_dtype,
        )
        self.density_activ = get_activation(cfg.density_activ)

    def _encode_3D(self, points):
        enc = hashgrid.encode(self.table, points, self.spec, pallas_backward=True)
        return jnp.concatenate([points, enc.astype(points.dtype)], axis=-1)


@register("model", "ingp")
class Model(nerf_model.Model):
    """Instant-NGP renderer (hash-encoded NeRF)."""

    def setup(self):
        cfg = self.cfg_model
        self.fine_sampling = cfg.fine_sampling
        self.density_reg = cfg.get("density_noise_reg")
        self.opaque_background = cfg.opaque_background
        self.bgcolor = self.cfg_data.get("bgcolor", 1.0)
        self.nerf = INGPField(cfg, compute_dtype=self.compute_dtype)
        if self.fine_sampling:
            self.nerf_fine = INGPField(cfg, compute_dtype=self.compute_dtype)
