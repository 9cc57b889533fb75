"""MLP building blocks (flax.linen).

Counterparts of the reference's ``MLPwithSkipConnection``
(projects/nerf/utils/nerf_util.py:158-196) and ``MLPforNeuralSDF`` with
geometric initialization (projects/neuralangelo/utils/mlp.py:18-85).

TPU notes: hidden dims are 256 — MXU-friendly; matmuls run in the module's
``compute_dtype`` (bf16 under mixed precision) with fp32 params. Weight
normalization is expressed as ``g * v / ||v||`` recomputed per call — XLA
folds it into the matmul epilogue.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class WNDense(nn.Module):
    """Dense layer with optional weight normalization (w = g * v/||v||_col).

    Matches torch's ``weight_norm(Linear)`` semantics: the norm is taken over
    each output unit's fan-in vector and ``g`` is initialized to that norm so
    the initial function is unchanged.
    """

    features: int
    use_weightnorm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        if self.use_weightnorm:
            # Exact torch weight_norm semantics: w = g * v/||v|| with
            # g initialized to ||v_init|| so the initial function equals the
            # raw init (critical for geometric initialization). The g
            # initializer closes over the just-created kernel param.
            g = self.param(
                "g", lambda _key: jnp.linalg.norm(kernel, axis=0) + 1e-12
            )
            norm = jnp.linalg.norm(kernel, axis=0, keepdims=True) + 1e-12
            kernel = g[None, :] * kernel / norm
        kernel = kernel.astype(self.compute_dtype)
        y = x.astype(self.compute_dtype) @ kernel + bias.astype(self.compute_dtype)
        return y


class MLPwithSkipConnection(nn.Module):
    """Plain MLP with input re-concatenation at the given layer indices.

    ``layer_dims`` lists channel counts including input and output, e.g.
    [in, h, h, h, out]. The final linear's bias initializes to zero (as the
    reference does at nerf_util.py:183).
    """

    layer_dims: Sequence[int]
    skip_connection: Sequence[int] = ()
    activ: Callable = jax.nn.relu
    use_weightnorm: bool = False
    use_layernorm: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x
        num_layers = len(self.layer_dims) - 1
        for li in range(num_layers):
            if li in self.skip_connection:
                feat = jnp.concatenate([feat, x.astype(feat.dtype)], axis=-1)
            feat = WNDense(
                self.layer_dims[li + 1],
                use_weightnorm=self.use_weightnorm,
                compute_dtype=self.compute_dtype,
                name=f"linear_{li}",
            )(feat)
            if li != num_layers - 1:
                if self.use_layernorm:
                    feat = nn.LayerNorm(name=f"ln_{li}")(feat)
                feat = self.activ(feat)
        return feat


def _geometric_hidden_init(first: bool, skip_dim: int) -> Callable:
    """Kernel init for hidden layers of the geometric SDF MLP.

    weight ~ N(0, sqrt(2/k_out)); for the first layer the columns feeding from
    positional encodings (input dims beyond xyz) are zeroed; skip-connection
    columns are zeroed. (Reference: mlp.py:71-77; note kernel here is
    [in, out] whereas torch stores [out, in].)
    """

    def init(key, shape, dtype=jnp.float32):
        k_in, k_out = shape
        w = jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / k_out)
        if first:
            w = w.at[3:, :].set(0.0)
        if skip_dim:
            w = w.at[-skip_dim:, :].set(0.0)
        return w

    return init


def _geometric_sdf_head_init(invert: bool) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        k_in, _ = shape
        w = jax.random.normal(key, shape, dtype) * 1e-4 + np.sqrt(np.pi / k_in)
        if invert:
            w = -w
        return w

    return init


class MLPforNeuralSDF(nn.Module):
    """SDF MLP with a separate linear SDF head branching off the last hidden
    input, geometric initialization, and (optional) weight norm.

    Geometric init biases the network toward an initial sphere of radius
    ``out_bias`` (SAL-style), which NeuS-family training depends on.
    Returns (sdf [...,1] or None, feat [...,K] or None).
    """

    layer_dims: Sequence[int]
    skip_connection: Sequence[int] = ()
    activ: Callable = jax.nn.softplus
    use_weightnorm: bool = False
    geometric_init: bool = True
    out_bias: float = 0.5
    invert: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, with_sdf: bool = True, with_feat: bool = True):
        feat = x
        num_layers = len(self.layer_dims) - 1
        sdf_in = None
        for li in range(num_layers):
            if li in self.skip_connection:
                feat = jnp.concatenate([feat, x.astype(feat.dtype)], axis=-1)
            if li == num_layers - 1:
                sdf_in = feat  # SDF head reads the pre-final-layer features.
            k_in = feat.shape[-1]
            k_out = self.layer_dims[li + 1]
            if self.geometric_init:
                skip_dim = self.layer_dims[0] if li in self.skip_connection else 0
                kinit = _geometric_hidden_init(first=(li == 0), skip_dim=skip_dim)
            else:
                kinit = nn.initializers.lecun_normal()
            compute_this = li != num_layers - 1 or with_feat
            if compute_this:
                feat = WNDense(
                    k_out,
                    use_weightnorm=self.use_weightnorm,
                    kernel_init=kinit,
                    compute_dtype=self.compute_dtype,
                    name=f"linear_{li}",
                )(feat)
                feat = self.activ(feat)
        sdf = None
        if with_sdf:
            if self.geometric_init:
                sdf_kinit = _geometric_sdf_head_init(self.invert)
                sdf_binit = nn.initializers.constant((-self.out_bias) * (-1 if self.invert else 1))
            else:
                sdf_kinit = nn.initializers.lecun_normal()
                sdf_binit = nn.initializers.zeros
            sdf = WNDense(
                1,
                use_weightnorm=self.use_weightnorm,
                kernel_init=sdf_kinit,
                bias_init=sdf_binit,
                compute_dtype=self.compute_dtype,
                name="linear_sdf",
            )(sdf_in)
            # SDF values stay fp32 for stable NeuS CDF math.
            sdf = sdf.astype(jnp.float32)
        return sdf, (feat if with_feat else None)
