"""Optimizer/scheduler factory and parameter partitioning.

Counterpart of ``get_optimizer``/``get_scheduler``
(imaginaire/trainers/utils/get_trainer.py:101-223) and the partial-training
machinery (``optim.partial_training`` at projects/NeuralLumen/model.py:422-438,
``trainer.partial_grad`` at projects/NeuralLumen/trainer.py:44-54).

On TPU the apex FusedAdam has no role — XLA fuses optax updates. Partial
training is a parameter partition: frozen leaves are closed over as constants
so the backward pass through them is dead-code-eliminated entirely (stronger
than the reference's requires_grad masking, which still backprops through the
frozen hash grid).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from mlinerf_tpu.utils.misc import get_schedule


def make_optimizer(cfg_optim, max_iter: int = None,
                   grad_accum: int = 1) -> Tuple[optax.GradientTransformation, Callable]:
    """Build an optax optimizer with an LR schedule multiplier.

    Returns (tx, lr_fn) where lr_fn(step) gives the absolute learning rate
    for logging.

    ``grad_accum > 1`` wraps the transformation in ``optax.MultiSteps``:
    gradients from k consecutive steps are averaged and ONE inner update is
    applied on the k-th (the reference's ``grad_accum_iter``,
    imaginaire/trainers/base.py — k× larger effective batch). The inner
    schedule is re-indexed by ``k * update_count`` so the LR follows the
    outer iteration counter exactly as the reference's per-iteration
    scheduler does.
    """
    name = cfg_optim.type.lower()
    params_cfg = dict(cfg_optim.get("params", {}))
    base_lr = params_cfg.pop("lr", 1e-3)
    sched_fn = get_schedule(cfg_optim.get("sched", {"type": "constant"}), max_iter=max_iter)
    grad_accum = max(int(grad_accum or 1), 1)

    def lr_schedule(step):
        # `step` counts inner-optimizer updates; under accumulation each
        # update corresponds to grad_accum outer iterations.
        return base_lr * sched_fn(step * grad_accum)

    kwargs = {}
    if "weight_decay" in params_cfg:
        kwargs["weight_decay"] = params_cfg.pop("weight_decay")
    if "betas" in params_cfg:
        b1, b2 = params_cfg.pop("betas")
        kwargs["b1"], kwargs["b2"] = b1, b2
    if "eps" in params_cfg:
        kwargs["eps"] = params_cfg.pop("eps")

    # Low-precision params (bf16 hash tables) keep fp32 first moments, the
    # standard mixed-precision Adam arrangement (tcnn's fused Adam likewise
    # keeps fp32 state over fp16 tables).
    kwargs["mu_dtype"] = jnp.float32

    if name in ("adam", "fusedadam"):
        kwargs.pop("weight_decay", None)
        tx = optax.adam(lr_schedule, **kwargs)
    elif name == "adamw":
        tx = optax.adamw(lr_schedule, **kwargs)
    elif name in ("sgd", "fusedsgd"):
        momentum = params_cfg.pop("momentum", 0.0)
        tx = optax.sgd(lr_schedule, momentum=momentum)
    elif name == "radam":
        kwargs.pop("weight_decay", None)
        kwargs.pop("mu_dtype", None)
        tx = optax.radam(lr_schedule, **kwargs)
    else:
        raise NotImplementedError(f"Unknown optimizer {cfg_optim.type}")
    # Per-group LR multipliers (``optim.lr_scales: {<path keyword>: s}``) —
    # the param-group capability of the reference's optimizer factory
    # (imaginaire/utils/trainer.py param_groups), expressed as masked update
    # scaling. Motivating use: the corner-sampled table scatter inflates
    # Adam's second moment by the estimator variance (~1/q per coordinate),
    # which silently SHRINKS the effective table LR by its square root —
    # ``lr_scales: {hash_table: ~sqrt(row_cut)}`` compensates (PERF.md
    # round-3 csamp analysis; gated by AB_STUDY=csamp lrx arms).
    lr_scales = dict(cfg_optim.get("lr_scales", {}) or {})
    for kw, scale in lr_scales.items():
        def mask_fn(params, kw=kw):
            return trainable_mask(params, [kw])

        tx = optax.chain(tx, optax.masked(optax.scale(float(scale)), mask_fn))
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)

    def lr_logging(step):
        return base_lr * sched_fn(step)

    return tx, lr_logging


def param_path_matches(path: Sequence, keywords: Sequence[str]) -> bool:
    """True when any keyword appears in the '/'-joined param path — the same
    substring-match contract as the reference's named_parameters scan."""
    joined = "/".join(str(getattr(k, "key", k)) for k in path)
    return any(kw in joined for kw in keywords)


def trainable_mask(params, keywords: Sequence[str]):
    """Pytree of bools: True where the param path matches any keyword."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    mask_leaves = [param_path_matches(path, keywords) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def partition_params(params, keywords: Sequence[str]):
    """Split params into (trainable, frozen) trees with None placeholders."""
    mask = trainable_mask(params, keywords)
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask,
                             is_leaf=lambda x: x is None)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask,
                          is_leaf=lambda x: x is None)
    return trainable, frozen


def merge_params(trainable, frozen):
    return jax.tree.map(
        lambda a, b: a if a is not None else b, trainable, frozen,
        is_leaf=lambda x: x is None,
    )


def global_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(tree) if x is not None]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.zeros(())


def ema_update(avg_params, new_params, beta: float):
    """Exponential moving average of parameters (the reference's
    ``ModelAverage`` on a side CUDA stream — here just another fused XLA op)."""
    return jax.tree.map(lambda a, p: a * beta + p * (1.0 - beta), avg_params, new_params)
