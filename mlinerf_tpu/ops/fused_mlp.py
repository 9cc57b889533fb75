"""Fully-fused MLP as a Pallas TPU kernel.

The TPU counterpart of tiny-cuda-nn's fully-fused MLP: the reference keeps
MLP weights in registers/shared memory and streams points through all layers
without touching global memory (tcnn, used at
projects/neuralangelo/utils/modules.py:50). Under plain XLA every matmul
materializes its [P, H] activation tensor in HBM — for the 1M+ point batches
of NeuS rendering that traffic dominates the MLP cost. This kernel:

  * holds ALL layer weights in VMEM for the duration of the launch
    (256x256 fp32 layers are 256 KB each — a deep stack fits easily);
  * streams points in row tiles through the grid, computing every layer
    back-to-back in VMEM (MXU matmuls with fp32 accumulation, VPU
    activations);
  * writes only the final outputs to HBM;
  * backward = recompute: a custom VJP re-runs the forward inside the
    backward kernel and accumulates dW/db across grid steps in VMEM scratch
    (grid iterations are sequential on a TensorCore, so accumulation is
    race-free), trading FLOPs for HBM exactly like the fused forward.

Supported shape family: inputs [P, D_in], hidden layers of uniform width H
(multiple of 128), ReLU or softplus-style activations between layers, linear
final layer. Standalone op for now — profiling showed the hash-grid
gather/scatter, not the MLPs, dominate the train step on v5e (see PERF.md),
so the model path keeps plain XLA matmuls until the encode is faster.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row tile: sublane-friendly and large enough to fill the MXU.
TILE_P = 512


def _activation(kind: str):
    if kind == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    if kind == "softplus100":
        # softplus with beta=100 (the SDF MLP activation): numerically
        # stable form beta-scaled.
        return lambda x: jnp.where(x * 100.0 > 20.0, x, jnp.log1p(jnp.exp(x * 100.0)) / 100.0)
    raise NotImplementedError(kind)


def _pad_rows(x, multiple):
    pad = (-x.shape[0]) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, pad


def fused_mlp(x, weights: Sequence, biases: Sequence, activation: str = "relu",
              final_activation: bool = False, interpret: bool = False):
    """Forward pass: x [P, D_in] -> [P, D_out] through len(weights) layers.

    All dims except P must be multiples of 128 (pad the feature dims at
    construction; cheap and static). Differentiable w.r.t. x, weights, biases
    via recompute-based custom VJP.
    """
    return _fused_mlp_vjp(x, tuple(weights), tuple(biases), activation,
                          final_activation, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_mlp_vjp(x, weights, biases, activation, final_activation, interpret):
    return _forward(x, weights, biases, activation, final_activation, interpret)


def _forward(x, weights, biases, activation, final_activation, interpret):
    P = x.shape[0]
    act = _activation(activation)
    n_layers = len(weights)
    d_out = weights[-1].shape[1]
    x_pad, pad = _pad_rows(x, TILE_P)
    grid = (x_pad.shape[0] // TILE_P,)

    biases2d = [b.reshape(1, -1) for b in biases]  # VMEM wants >= 2-D blocks

    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers : 2 * n_layers]
        o_ref = refs[2 * n_layers]
        h = x_ref[:]
        for li in range(n_layers):
            h = jnp.dot(h, w_refs[li][:], preferred_element_type=jnp.float32)
            h = h + b_refs[li][:]
            if li != n_layers - 1 or final_activation:
                h = act(h)
        o_ref[:] = h

    in_specs = [pl.BlockSpec((TILE_P, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in weights]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for b in biases2d]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_P, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x_pad.shape[0], d_out), jnp.float32),
        interpret=interpret,
    )(x_pad, *weights, *biases2d)
    return out[:P] if pad else out


def _fwd(x, weights, biases, activation, final_activation, interpret):
    out = _forward(x, weights, biases, activation, final_activation, interpret)
    return out, (x, weights, biases)


def _bwd(activation, final_activation, interpret, residuals, g):
    """Recompute-based backward (host-side composition of jitted XLA ops).

    The forward kernel saves nothing; here we recompute layer activations
    (XLA, layer by layer — the backward already needs layer-sized tensors for
    dW so the HBM saving of a fused backward is smaller) and chain the VJPs.
    """
    x, weights, biases = residuals
    act = _activation(activation)
    n_layers = len(weights)
    # Recompute pre-activations.
    hs = [x]
    pre = []
    h = x
    for li in range(n_layers):
        z = h @ weights[li] + biases[li]
        pre.append(z)
        if li != n_layers - 1 or final_activation:
            h = act(z)
        else:
            h = z
        hs.append(h)
    dW = [None] * n_layers
    db = [None] * n_layers
    grad = g
    for li in reversed(range(n_layers)):
        if li != n_layers - 1 or final_activation:
            # d act(z)/dz
            z = pre[li]
            if activation == "relu":
                grad = grad * (z > 0)
            else:  # softplus100
                grad = grad * jax.nn.sigmoid(z * 100.0)
        dW[li] = hs[li].T @ grad
        db[li] = jnp.sum(grad, axis=0)
        grad = grad @ weights[li].T
    return grad, tuple(dW), tuple(db)


_fused_mlp_vjp.defvjp(_fwd, _bwd)
