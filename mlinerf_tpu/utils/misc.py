"""Small shared utilities: activations, LR schedules, image reshaping.

Counterpart of ``projects/neuralangelo/utils/misc.py`` (schedules, activation
zoo, ``to_full_image``) plus the generic scheduler table of
``imaginaire/trainers/utils/get_trainer.py:149-223`` — all expressed as optax
schedules (iteration -> multiplier) so they compose with any optimizer.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def get_activation(name: str, **kwargs) -> Callable:
    """Activation by name (the reference's in-place variants map to the
    functional ones; XLA fuses either way)."""
    table = {
        "identity": lambda x: x,
        "relu": jax.nn.relu,
        "relu_": jax.nn.relu,
        "abs": jnp.abs,
        "abs_": jnp.abs,
        "sigmoid": jax.nn.sigmoid,
        "sigmoid_": jax.nn.sigmoid,
        "exp": jnp.exp,
        "exp_": jnp.exp,
        "softplus": jax.nn.softplus,
        "silu": jax.nn.silu,
        "silu_": jax.nn.silu,
    }
    fn = table[name]
    if name == "softplus" and "beta" in kwargs:
        beta = kwargs["beta"]
        return lambda x: jax.nn.softplus(x * beta) / beta
    return fn


# ---------------------------------------------------------------------------
# LR schedules: callables iteration -> multiplicative factor on base LR.
# ---------------------------------------------------------------------------


def schedule_two_steps_with_warmup(warm_up_end: int, two_steps, gamma: float):
    s0, s1 = two_steps

    def sch(x):
        x = jnp.asarray(x, jnp.float32)
        warm = x / warm_up_end
        post = jnp.where(x > s1, 1.0 / gamma**2, jnp.where(x > s0, 1.0 / gamma, 1.0))
        return jnp.where(x < warm_up_end, warm, post)

    return sch


def schedule_cos_with_warmup(warm_up_end: int, max_iter: int, alpha: float):
    def sch(x):
        x = jnp.asarray(x, jnp.float32)
        warm = x / warm_up_end
        progress = (x - warm_up_end) / (max_iter - warm_up_end)
        cos = (jnp.cos(np.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return jnp.where(x < warm_up_end, warm, cos)

    return sch


def schedule_step(step_size: int, gamma: float):
    step_size_f = float(step_size)  # may exceed int32; schedule math is fp32

    def sch(x):
        x = jnp.asarray(x, jnp.float32)
        return gamma ** jnp.floor(x / step_size_f)

    return sch


def schedule_constant():
    return lambda x: jnp.ones_like(jnp.asarray(x, jnp.float32))


def schedule_linear_warmup(warmup_steps: int):
    def sch(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.minimum(x / max(warmup_steps, 1), 1.0)

    return sch


def schedule_cosine_warmup(warmup_steps: int, max_iter: int):
    def sch(x):
        x = jnp.asarray(x, jnp.float32)
        warm = x / max(warmup_steps, 1)
        progress = jnp.clip((x - warmup_steps) / max(max_iter - warmup_steps, 1), 0, 1)
        return jnp.where(x < warmup_steps, warm, 0.5 * (1 + jnp.cos(np.pi * progress)))

    return sch


def get_schedule(cfg_sched, max_iter: int = None) -> Callable:
    """Build a schedule callable from an `optim.sched` config node."""
    stype = cfg_sched.get("type", "step")
    if stype == "two_steps_with_warmup":
        return schedule_two_steps_with_warmup(cfg_sched.warm_up_end, cfg_sched.two_steps, cfg_sched.gamma)
    if stype == "cos_with_warmup":
        return schedule_cos_with_warmup(cfg_sched.warm_up_end, cfg_sched.get("max_iter", max_iter), cfg_sched.alpha)
    if stype == "step":
        return schedule_step(cfg_sched.get("step_size", 10**10), cfg_sched.get("gamma", 1.0))
    if stype == "constant":
        return schedule_constant()
    if stype == "linear_warmup":
        return schedule_linear_warmup(cfg_sched.warmup_steps)
    if stype == "cosine_warmup":
        return schedule_cosine_warmup(cfg_sched.warmup_steps, cfg_sched.get("max_iter", max_iter))
    raise NotImplementedError(f"Unknown scheduler type {stype}")


# ---------------------------------------------------------------------------
# Image helpers
# ---------------------------------------------------------------------------


def clamp_with_gradient(x, min_value: float, max_value: float):
    """Clamp with a learning signal outside the range.

    Counterpart of the reference's ``CustomClamp``/``ClampWithGradient``
    (projects/NeuralLumen/utils/modules.py:268-299, unused in shipped
    configs): the forward clamps to [min, max]; the backward passes the
    upstream cotangent through inside the range and replaces it with a
    CONSTANT 1 outside (the reference's exact, quirky semantics —
    ``grad_input[(x < min) | (x > max)] = 1`` — a fixed push rather than a
    zeroed or straight-through gradient).
    """

    @jax.custom_vjp
    def _clamp(v):
        return jnp.clip(v, min_value, max_value)

    def fwd(v):
        return jnp.clip(v, min_value, max_value), v

    def bwd(v, g):
        outside = (v < min_value) | (v > max_value)
        return (jnp.where(outside, jnp.ones_like(g), g),)

    _clamp.defvjp(fwd, bwd)
    return _clamp(x)


def to_full_image(image, image_size=None, from_vec: bool = True):
    """[B,HW,...,K] -> [B,K,H,W,...] (or [B,H,W,...,K] -> [B,K,H,W,...])."""
    if from_vec:
        assert image_size is not None
        H, W = image_size
        image = image.reshape(image.shape[0], H, W, *image.shape[2:])
    return jnp.moveaxis(image, -1, 1)
