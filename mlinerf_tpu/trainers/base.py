"""Training engine: jitted train step, device-resident data sampling,
checkpoint triggers, validation/inference loops, logging, watchdog.

Capability parity with the reference trainer stack
(``imaginaire/trainers/base.py`` + ``projects/nerf/trainers/base.py``),
re-designed TPU-first:

  * the ENTIRE hot path — image pick, ray pick, pixel gather, render, loss,
    backward, optimizer, EMA — is ONE jitted XLA program; the training set
    lives in device memory as stacked arrays (images stay uint8 in HBM and
    decode to fp32 per-gather), so the host never touches the iteration loop
    except for logging cadence;
  * all schedules (progress, coarse-to-fine level mask, normal epsilon,
    curvature weight, LR) are computed inside the step from the traced
    iteration counter — nothing recompiles over a 500k-iteration run;
  * multi-chip scaling shards the ray axis via sharding constraints
    (see parallel/mesh.py); gradients are combined by XLA collectives, the
    TPU-native replacement for DDP/NCCL;
  * partial training (stage b) partitions the param tree so frozen subtrees
    are constants — backward through the hash grid is DCE'd, not just masked.
"""

from __future__ import annotations

import functools
import json
import os
import signal
import time
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import StaticConfig, resolve
from mlinerf_tpu.parallel import mesh as pmesh
from mlinerf_tpu.trainers.checkpoint import Checkpointer, nonstrict_restore
from mlinerf_tpu.trainers import optim as optim_lib
from mlinerf_tpu.utils import camera, sampling as samp


def _is_worker_fault(exc: Exception) -> bool:
    """Classify a device-runtime failure as a recoverable worker fault.

    The v5e worker crash under sustained scatter pressure surfaces as an
    ``XlaRuntimeError`` whose message names the crashed/restarted worker
    (PERF.md "worker-fault bisection"); transient bring-up faults appear as
    FAILED_PRECONDITION/DATA_LOSS. Host-side errors (NaN kill-switch,
    TimeoutError, bugs) must NOT match — recovery would mask them.
    """
    if type(exc).__name__ not in (
            "XlaRuntimeError", "JaxRuntimeError", "InternalError",
            "FailedPreconditionError", "RuntimeError"):
        return False
    msg = str(exc).lower()
    return any(sig in msg for sig in (
        "worker process crashed", "crashed or restarted", "tpu worker",
        "kernel fault", "data_loss", "data loss", "failed_precondition",
        "failed precondition", "socket closed", "connection reset",
        "injected worker fault",  # fault-injection tests
    ))


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    iteration: jnp.ndarray  # int32 scalar
    ema_params: Any = None


class MetricsLogger:
    """JSONL metrics sink + optional W&B and TensorBoard.

    W&B resume: the run id persists in ``<logdir>/wandb_id.txt`` so a
    resumed training continues the SAME wandb run (reference
    imaginaire/trainers/base.py:231-272). TensorBoard scalars/images are
    written when ``tensorboard: true`` (reference
    imaginaire/trainers/utils/meters.py:56-147).
    """

    def __init__(self, logdir: str, use_wandb: bool = False, wandb_name: str = None,
                 use_tensorboard: bool = False, enabled: bool = True):
        # ``enabled=False`` (non-main processes on multi-host runs) keeps the
        # object API-complete but writes nothing — the reference's
        # is_master() gating (imaginaire/utils/distributed.py).
        self.enabled = enabled
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self.wandb = None
        self.tb = None
        use_wandb = use_wandb and enabled
        use_tensorboard = use_tensorboard and enabled
        if use_wandb:
            try:
                import wandb

                wandb_id = self._persistent_wandb_id(wandb)
                wandb.init(project="mlinerf_tpu", name=wandb_name, dir=logdir,
                           id=wandb_id, resume="allow")
                self.wandb = wandb
            except Exception as exc:  # pragma: no cover
                print(f"[logger] wandb unavailable ({exc}); falling back to JSONL only")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir=os.path.join(logdir, "tensorboard"))
            except Exception as exc:  # pragma: no cover
                print(f"[logger] tensorboard unavailable ({exc})")

    def _persistent_wandb_id(self, wandb) -> str:
        """Read or mint the run id stored next to the checkpoints."""
        id_path = os.path.join(self.logdir, "wandb_id.txt")
        if os.path.exists(id_path):
            with open(id_path) as f:
                return f.read().strip()
        run_id = wandb.util.generate_id()
        with open(id_path, "w") as f:
            f.write(run_id)
        return run_id

    def log_scalars(self, scalars: Dict[str, float], step: int):
        if not self.enabled:
            return
        rec = {"step": int(step), **{k: float(v) for k, v in scalars.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb:
            self.wandb.log(scalars, step=step)
        if self.tb:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), global_step=step)
            self.tb.flush()

    def log_images(self, images: Dict[str, np.ndarray], step: int):
        if not self.enabled:
            return
        img_dir = os.path.join(self.logdir, "images", f"{step:09d}")
        os.makedirs(img_dir, exist_ok=True)
        from mlinerf_tpu.utils.console import get_heatmap
        from mlinerf_tpu.utils.image_io import save_image

        for key, img in images.items():
            arr = np.asarray(img)
            # Single-channel maps (inv-depth, opacity, visibility) are
            # colorized like the reference's wandb panels
            # (imaginaire/utils/visualization.py:29-41).
            if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[-1] == 1):
                arr = get_heatmap(arr[..., 0] if arr.ndim == 3 else arr)
            save_image(os.path.join(img_dir, key.replace("/", "_") + ".png"), arr)
        if self.wandb:
            self.wandb.log({k: self.wandb.Image(np.asarray(v)) for k, v in images.items()}, step=step)
        if self.tb:
            for k, v in images.items():
                self.tb.add_image(k, np.clip(np.asarray(v), 0, 1), global_step=step,
                                  dataformats="HWC")
            self.tb.flush()


class Watchdog:
    """SIGALRM-based stall detector (reference: imaginaire/utils/misc.py:282)."""

    def __init__(self, timeout_period: int):
        self.timeout_period = timeout_period
        self.enabled = timeout_period < 9999999 and hasattr(signal, "SIGALRM")
        if self.enabled:
            signal.signal(signal.SIGALRM, self._handler)

    def _handler(self, signum, frame):  # pragma: no cover
        raise TimeoutError(f"Training stalled for {self.timeout_period}s — aborting.")

    def reset(self):
        if self.enabled:
            signal.alarm(self.timeout_period)

    def disarm(self):
        if self.enabled:
            signal.alarm(0)


class PhaseTimer:
    """Forward/backward/step wall-clock split under ``speed_benchmark``.

    On TPU the analog of cuda.synchronize is ``block_until_ready`` on step
    outputs; per-phase GPU timing does not map 1:1 to a fused XLA program, so
    we report whole-step time plus compile time.
    """

    def __init__(self):
        self.time_iteration = 0.0
        self.time_epoch = 0.0
        self._t0 = time.time()
        self._iter_start = self._t0
        self._count = 0

    def start_iteration(self):
        self._iter_start = time.time()

    def end_iteration(self):
        dt = time.time() - self._iter_start
        self._count += 1
        # Running mean over the logging window.
        self.time_iteration += (dt - self.time_iteration) / min(self._count, 100)


class BaseTrainer:
    """Generic trainer: subclasses override ``compute_loss`` and ``make_cond``.

    Construction mirrors the reference flow (build model -> optimizer ->
    scheduler -> checkpointer -> losses) but everything lands in pure
    functions + pytrees.
    """

    # Static hash-level cap for the CURRENT dispatch window (None = no cap);
    # set by train() right before each window, captured at step trace time.
    _train_max_levels = None

    def __init__(self, cfg, is_inference: bool = False, seed: int = 0, logdir: Optional[str] = None):
        self.cfg = cfg
        self.seed = seed
        self.logdir = logdir or cfg.get("logdir") or "logs/default"
        self.is_inference = is_inference
        self.compute_dtype = (
            jnp.bfloat16
            if cfg.trainer.get("amp_config", {}).get("enabled", False)
            else jnp.float32
        )
        self.mesh = pmesh.get_mesh(cfg.get("runtime", {}).get("mesh", "rays"))
        # Gradient-combine policy. ``runtime.grad_psum`` defaults to "auto":
        # on any real mesh (> 1 device) the explicit-DDP shard_map layout is
        # the default — the partitioner's constraint layout all-gathers the
        # scatter OPERANDS (1.26 GB/step measured at the bench shape) where
        # DDP moves one summed table grad (225 MB; PERF.md round 4). On a
        # single chip the constraint layout stays: it is bitwise-exact vs
        # the unsharded program and grad_psum would be a no-op. Explicit
        # True/"bf16"/False override the policy either way.
        rt = cfg.get("runtime", {})
        requested = rt.get("grad_psum", "auto")
        if requested and requested != "auto" and rt.get("shard_tables"):
            # Mutually exclusive by construction: the shard_map in_specs for
            # params are P() (replicated), so ZeRO row-sharded tables would
            # be silently re-gathered every step — negating the memory lever
            # AND the comm cut (ADVICE round 4).
            raise ValueError(
                "runtime.grad_psum and runtime.shard_tables are mutually "
                "exclusive: the DDP shard_map layout replicates params, so "
                "row-sharded tables would be re-gathered every step. Enable "
                "at most one (grad_psum cuts comm; shard_tables cuts "
                "optimizer-state memory)."
            )
        if requested == "auto":
            self.grad_psum = bool(
                self.mesh is not None
                and self.mesh.devices.size > 1
                and not rt.get("shard_tables")
            )
        else:
            self.grad_psum = requested  # False | True | "bf16"
        self._grad_psum_warned = False

        # Model ------------------------------------------------------------
        model_cls = resolve("model", cfg.model.type)
        # StaticConfig: linen would freeze raw dicts into FrozenDicts.
        self.model = model_cls(
            StaticConfig(cfg.model), StaticConfig(cfg.data), compute_dtype=self.compute_dtype
        )
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(self.rng)
        self.params = self._init_params(init_rng)
        self.params = self._apply_weight_init(self.params, cfg)
        self.num_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
        print(f"[model] {cfg.model.type}: {self.num_params / 1e6:.2f}M parameters")

        # Optimizer ---------------------------------------------------------
        # grad_accum_iter: REAL accumulate-then-update (optax.MultiSteps) —
        # k steps contribute their mean gradient to one inner update
        # (reference imaginaire/trainers/base.py grad accumulation).
        self.grad_accum = max(int(cfg.trainer.get("grad_accum_iter", 1) or 1), 1)
        self.tx, self.lr_fn = optim_lib.make_optimizer(
            cfg.optim, max_iter=cfg.max_iter, grad_accum=self.grad_accum
        )
        self.partial_keywords = list(cfg.optim.get("partial_training", []) or [])
        if not self.partial_keywords:
            self.partial_keywords = list(cfg.trainer.get("partial_grad", []) or [])
        if self.partial_keywords:
            trainable, _ = optim_lib.partition_params(self.params, self.partial_keywords)
            self.opt_state = self.tx.init(trainable)
            n_train = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(trainable) if p is not None)
            print(f"[optim] partial training on {self.partial_keywords}: {n_train/1e6:.2f}M trainable")
        else:
            self.opt_state = self.tx.init(self.params)

        # EMA ----------------------------------------------------------------
        self.ema_enabled = cfg.trainer.ema_config.enabled
        # Real copies: ema leaves must not alias param buffers (the train
        # step donates the whole state — aliased leaves double-donate).
        ema_params = jax.tree.map(jnp.copy, self.params) if self.ema_enabled else None

        self.state = TrainState(
            params=self.params,
            opt_state=self.opt_state,
            iteration=jnp.zeros((), jnp.int32),
            ema_params=ema_params,
        )
        if self.mesh is not None and cfg.get("runtime", {}).get("shard_tables"):
            # ZeRO-style row-sharding of the hash-table state over the mesh
            # (see parallel/mesh.shard_hash_tables). Output shardings follow
            # from the donated inputs, so the jitted step keeps them.
            self.state = pmesh.shard_hash_tables(self.mesh, self.state)

        # Bookkeeping ---------------------------------------------------------
        self.current_iteration = 0
        self.current_epoch = 0
        # Multi-host: only process 0 writes logs/checkpoints (reference
        # is_master() gating); other processes keep API-complete no-op sinks.
        is_main = pmesh.is_main_process()
        self.checkpointer = Checkpointer(cfg, self.logdir, enabled=is_main)
        self.logger = MetricsLogger(self.logdir, use_wandb=cfg.get("wandb", False),
                                    wandb_name=cfg.get("wandb_name"),
                                    use_tensorboard=cfg.get("tensorboard", False),
                                    enabled=is_main)
        self.watchdog = Watchdog(cfg.timeout_period)
        self.timer = PhaseTimer()
        self.losses_host: Dict[str, float] = {}
        self.metrics_host: Dict[str, float] = {}
        self.init_losses(cfg)
        self._maybe_warm_start(cfg)

    # ------------------------------------------------------------------
    # Setup pieces
    # ------------------------------------------------------------------

    def _init_params(self, rng):
        data = self._dummy_batch()
        cond = self.make_cond(jnp.zeros((), jnp.int32))
        variables = self.model.init(rng, data, cond, rng, train=True)
        return variables["params"]

    def _dummy_batch(self) -> Dict[str, jnp.ndarray]:
        """Minimal batch for parameter initialization (shape-only)."""
        cfg = self.cfg
        B = 1
        R = min(cfg.model.render.get("rand_rays", 128) if "render" in cfg.model else 128, 32)
        H, W = cfg.data.train.image_size
        batch = dict(
            pose=jnp.broadcast_to(jnp.eye(3, 4), (B, 3, 4)),
            intr=jnp.broadcast_to(jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]), (B, 3, 3)),
            ray_idx=jnp.zeros((B, R), jnp.int32),
            idx=jnp.zeros((B,), jnp.int32),
            image_sampled=jnp.zeros((B, R, 3)),
        )
        if self._needs_light():
            batch["pose_light"] = jnp.broadcast_to(jnp.eye(3, 4), (B, 3, 4))
        return batch

    def _needs_light(self) -> bool:
        return False

    def _apply_weight_init(self, params, cfg):
        """Global weight re-initialization by ``trainer.init.type``.

        Counterpart of the reference's post-construction ``weights_init``
        sweep over all Linear layers (imaginaire/models/utils/
        init_weight.py:17-91). Applied only when a scheme is configured
        (type != none) — geometric-init models ship with type none.
        """
        init_cfg = cfg.trainer.get("init", {}) or {}
        itype = init_cfg.get("type") or "none"
        if itype == "none":
            return params
        gain = init_cfg.get("gain") or 1.0
        initializers = {
            "normal": nn.initializers.normal(stddev=0.02 * gain),
            "xavier": nn.initializers.variance_scaling(gain, "fan_avg", "truncated_normal"),
            "xavier_uniform": nn.initializers.variance_scaling(gain, "fan_avg", "uniform"),
            "kaiming": nn.initializers.variance_scaling(2.0 * gain, "fan_in", "normal"),
            "orthogonal": nn.initializers.orthogonal(scale=gain),
        }
        if itype not in initializers:
            raise NotImplementedError(f"Unknown init type {itype}")
        init_fn = initializers[itype]
        rng = jax.random.PRNGKey(self.seed + 9999)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        leaves = []
        for i, (path, leaf) in enumerate(flat):
            names = "/".join(str(getattr(k, "key", k)) for k in path)
            if names.endswith("kernel") and hasattr(leaf, "ndim") and leaf.ndim == 2:
                leaves.append(init_fn(jax.random.fold_in(rng, i), leaf.shape, leaf.dtype))
            else:
                leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def init_losses(self, cfg):
        self.weights = {
            k: float(v) for k, v in cfg.trainer.get("loss_weight", {}).items() if v is not None
        }

    def _maybe_warm_start(self, cfg):
        """Cross-stage non-strict restore (``model.use_pre_trained``)."""
        upt = cfg.model.get("use_pre_trained")
        if not upt:
            return
        payload = Checkpointer.load_file(upt.pt_filename)
        source = payload["state"]["params"]
        # fetch_to_host (not device_get): under runtime.shard_tables +
        # multihost the live params are cross-host sharded — the fetch is a
        # collective every process reaches here (same path on all hosts).
        from mlinerf_tpu.trainers.checkpoint import fetch_to_host
        new_params, report = nonstrict_restore(fetch_to_host(self.state.params), source)
        print(f"[warm-start] loaded {upt.pt_filename}")
        print(f"  missing keys: {report['missing'][:8]}{'...' if len(report['missing'])>8 else ''}")
        print(f"  unexpected keys: {report['unexpected'][:8]}{'...' if len(report['unexpected'])>8 else ''}")
        self.state = self.state.replace(params=jax.tree.map(jnp.asarray, new_params))
        self._reshard_state()

    def _reshard_state(self):
        """Re-apply the configured state shardings after a load/warm-start.

        ``load_checkpoint``/``_maybe_warm_start`` replace state leaves with
        freshly ``jnp.asarray``-ed host values (process-local, unsharded);
        when ``runtime.shard_tables`` placed hash-table rows across the mesh
        at init, the restored leaves must go back to those shardings or the
        next jitted step recompiles against (and on multi-host, miscommits)
        the wrong layout.
        """
        if self.mesh is not None and self.cfg.get("runtime", {}).get("shard_tables"):
            self.state = pmesh.shard_hash_tables(self.mesh, self.state)

    # ------------------------------------------------------------------
    # Schedule plumbing (overridden per project)
    # ------------------------------------------------------------------

    def make_cond(self, iteration) -> Dict[str, Any]:
        """Per-iteration conditioning inputs (traced-friendly)."""
        return {"progress": jnp.asarray(iteration, jnp.float32) / self.cfg.max_iter}

    def static_max_levels_for(self, it_end: int):
        """Static hash-level cap valid through iteration ``it_end`` (or None).

        Coarse-to-fine annealing masks inactive levels with a binary traced
        mask — mathematically exact but every masked level still pays its
        gathers and gradient scatter-adds. Trainers with a hash-grid encoder
        override this to return the active-level count at the END of a
        dispatch window so the train step can skip inactive levels entirely
        (the mask keeps intra-window growth exact); the jit cache is keyed on
        it, costing one retrace per level-growth event (<= num_levels per run).
        """
        return None

    def loss_weights_at(self, iteration, cond) -> Dict[str, Any]:
        """Loss weights; traced scalars allowed (e.g. curvature warmup)."""
        return {k: jnp.asarray(v, jnp.float32) for k, v in self.weights.items()}

    # ------------------------------------------------------------------
    # Loss (overridden per project)
    # ------------------------------------------------------------------

    def compute_loss(self, output, batch, mode: str):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # The jitted train step
    # ------------------------------------------------------------------

    def sample_batch(self, arrays: Dict[str, jnp.ndarray], rng) -> Dict[str, jnp.ndarray]:
        """Device-side batch sampling from the resident dataset arrays.

        Replaces the host dataloader + randperm of the reference
        (projects/neuralangelo/data.py:84-92) with on-device gathers.
        """
        cfg = self.cfg
        B = cfg.data.train.batch_size
        H, W = cfg.data.train.image_size
        R = self.num_rand_rays()
        k_img, k_ray = jax.random.split(rng)
        N = arrays["pose"].shape[0]
        img_idx = jax.random.randint(k_img, (B,), 0, N)
        ray_idx = samp.random_ray_indices(k_ray, B, H * W, R)
        batch = {"idx": img_idx, "ray_idx": ray_idx}
        for key in ("pose", "intr", "pose_light"):
            if key in arrays:
                batch[key] = jnp.take(arrays[key], img_idx, axis=0)
        # Gather supervision pixels for the selected rays.
        for key, out_key in self.pixel_array_keys():
            if key in arrays:
                flat = jnp.take(arrays[key], img_idx, axis=0).reshape(B, H * W, -1)
                vals = samp.slice_by_ray_idx(flat, ray_idx)
                if arrays[key].dtype == jnp.uint8:
                    vals = vals.astype(jnp.float32) / 255.0
                batch[out_key] = vals
        return batch

    def pixel_array_keys(self):
        """(array_key, batch_key) pairs gathered per sampled ray."""
        return [("images", "image_sampled")]

    def num_rand_rays(self) -> int:
        return self.cfg.model.render.rand_rays

    def num_val_rays(self) -> int:
        if "render" in self.cfg.model:
            return self.cfg.model.render.get("rand_rays_val") or 20000
        return self.cfg.model.get("rand_rays_val") or 20000

    def build_train_step(self) -> Callable:
        return jax.jit(self._train_step_fn(), donate_argnums=(0,))

    def _train_step_fn(self) -> Callable:
        """The raw (un-jitted) train step — also the body of scanned loops."""
        cfg = self.cfg
        partial_kw = self.partial_keywords
        ema_cfg = cfg.trainer.ema_config

        def train_step(state: TrainState, arrays, rng):
            it = state.iteration
            rng = jax.random.fold_in(rng, it)
            k_batch, k_render = jax.random.split(rng)
            batch = self.sample_batch(arrays, k_batch)
            batch = pmesh.shard_rays_tree(self.mesh, batch, ray_axis_keys=("ray_idx",))
            cond = self.make_cond(it)
            if self._train_max_levels is not None:
                # Static per-window cap captured at trace time; the caller
                # keys the jit cache on it (see train()).
                cond = dict(cond)
                cond["max_levels"] = self._train_max_levels
            if "occupancy_grid" in arrays:
                cond = dict(cond)
                cond["occupancy_grid"] = arrays["occupancy_grid"]
            weights = self.loss_weights_at(it, cond)

            if partial_kw:
                trainable0, frozen = optim_lib.partition_params(state.params, partial_kw)
            else:
                trainable0, frozen = state.params, None

            def loss_fn(trainable):
                params = (
                    optim_lib.merge_params(trainable, frozen) if frozen is not None else trainable
                )
                output = self.model.apply({"params": params}, batch, cond, k_render, train=True)
                loss_dict, metric_dict = self.compute_loss(output, batch, mode="train")
                total = jnp.zeros((), jnp.float32)
                for key, value in loss_dict.items():
                    if key in weights:
                        total = total + weights[key] * value
                return total, (loss_dict, metric_dict)

            grad_specs = None
            if self.grad_psum and self.mesh is not None:
                grad_specs = pmesh.partial_grad_specs(
                    self.mesh, batch, ray_axis_keys=("ray_idx",)
                )
                if grad_specs is None and not self._grad_psum_warned:
                    # Trace-time (runs once per compile), outside the jitted
                    # graph: the user asked for the 5.6-11x comm cut but the
                    # ray axes don't divide the mesh — say so loudly instead
                    # of silently paying the operand-gather layout.
                    self._grad_psum_warned = True
                    shapes = {
                        k: tuple(getattr(v, "shape", ()))
                        for k, v in batch.items()
                        if k == "ray_idx" or k.endswith("_sampled")
                    }
                    print(
                        f"[grad_psum] WARNING: ray axes do not divide the "
                        f"{self.mesh.devices.size}-device mesh — falling back "
                        f"to the constraint layout (operand all-gathers, "
                        f"~5.6x more collective bytes). Offending ray-axis "
                        f"shapes: {shapes}", flush=True,
                    )
            if grad_specs is not None:
                # Explicit DDP layout (runtime.grad_psum): each device runs
                # the loss/grad on its LOCAL ray shard against replicated
                # params and the grads are combined with one pmean — the
                # per-GPU semantics of the reference's NCCL DDP
                # (get_trainer.py:80-88). vs the default constraint layout
                # this trades the partitioner's 1.26 GB/step scatter-operand
                # all-gathers for a ~268 MB table-grad all-reduce (PERF.md
                # round 4). Per-device rng is fold_in(axis_index) — jitter is
                # statistically identical but not bitwise vs the global
                # program (exact when model.render.stratified is off).
                # Normalization-coupled losses (weighted_shading/intrinsic)
                # normalize per-shard, exactly as per-GPU DDP does.
                axis = self.mesh.axis_names[0]
                from jax.sharding import PartitionSpec as _P

                def _local_grad(trainable, lbatch, key):
                    key = jax.random.fold_in(key, jax.lax.axis_index(axis))

                    def local_loss(t):
                        params = (
                            optim_lib.merge_params(t, frozen)
                            if frozen is not None else t
                        )
                        output = self.model.apply(
                            {"params": params}, lbatch, cond, key, train=True
                        )
                        ld, md = self.compute_loss(output, lbatch, mode="train")
                        tot = jnp.zeros((), jnp.float32)
                        for k, v in ld.items():
                            if k in weights:
                                tot = tot + weights[k] * v
                        return tot, (ld, md)

                    (tot, aux), g = jax.value_and_grad(
                        local_loss, has_aux=True
                    )(trainable)
                    pm = lambda t: jax.tree.map(
                        lambda x: jax.lax.pmean(x, axis), t)
                    if self.grad_psum == "bf16":
                        # Halve the wire bytes again: combine grads in bf16,
                        # hand fp32 back to the optimizer. ~1e-3 relative
                        # rounding on the combined grad — opt-in for pods
                        # where the grad all-reduce actually binds.
                        g = jax.tree.map(
                            lambda x: jax.lax.pmean(
                                x.astype(jnp.bfloat16), axis
                            ).astype(x.dtype), g)
                        return pm(tot), pm(aux), g
                    return pm(tot), pm(aux), pm(g)

                total, (loss_dict, metric_dict), grads = jax.shard_map(
                    _local_grad, mesh=self.mesh,
                    in_specs=(_P(), grad_specs, _P()),
                    out_specs=(_P(), _P(), _P()),
                    check_vma=False,
                )(trainable0, batch, k_render)
            else:
                (total, (loss_dict, metric_dict)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(trainable0)
            updates, new_opt_state = self.tx.update(grads, state.opt_state, trainable0)
            # Cast updates to the param dtype: fp32 optimizer math over bf16
            # tables must not promote the stored parameters.
            new_trainable = jax.tree.map(
                lambda p, u: (p + u.astype(p.dtype)) if p is not None else None,
                trainable0, updates, is_leaf=lambda x: x is None,
            )
            new_params = (
                optim_lib.merge_params(new_trainable, frozen) if frozen is not None else new_trainable
            )
            new_ema = state.ema_params
            if ema_cfg.enabled:
                beta = ema_cfg.beta
                new_ema = optim_lib.ema_update(state.ema_params, new_params, beta)
            new_state = TrainState(
                params=new_params,
                opt_state=new_opt_state,
                iteration=it + 1,
                ema_params=new_ema,
            )
            info = dict(total=total, losses=loss_dict, metrics=metric_dict,
                        grad_norm=optim_lib.global_norm(grads))
            return new_state, info

        return train_step

    def build_train_loop(self, num_steps: int) -> Callable:
        """Scan ``num_steps`` train steps into ONE dispatched XLA program.

        The TPU-native answer to per-step dispatch latency: with the dataset
        device-resident and all schedules derived from the traced iteration
        counter, a whole logging window of steps runs back-to-back on-chip.
        Returns mean losses/metrics over the window.
        """
        inner = self._train_step_fn()

        def train_loop(state: TrainState, arrays, rng):
            def body(carry, _):
                st = carry
                new_st, info = inner(st, arrays, rng)
                return new_st, (info["total"], info["losses"], info["metrics"], info["grad_norm"])

            state, (totals, losses, metrics, gnorms) = jax.lax.scan(
                body, state, None, length=num_steps
            )
            info = dict(
                total=jnp.mean(totals),
                losses=jax.tree.map(jnp.mean, losses),
                metrics=jax.tree.map(jnp.mean, metrics),
                grad_norm=jnp.mean(gnorms),
            )
            return state, info

        return jax.jit(train_loop, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # Train loop (host side)
    # ------------------------------------------------------------------

    def train(self, train_arrays: Dict[str, jnp.ndarray], val_dataset=None,
              show_progress: bool = False):
        cfg = self.cfg
        # Renders later in this process use conservative dispatch windows —
        # see _inference_window (post-training worker fragility, round 5).
        self._trained_in_process = True
        arrays = {k: jnp.asarray(v) for k, v in train_arrays.items()}
        state = self.state
        rng = jax.random.fold_in(self.rng, 17)
        max_iter = cfg.max_iter
        start_iter = self.current_iteration
        images_per_epoch = max(len(arrays["pose"]), 1)
        log_iter = cfg.logging_iter
        scalar_iter = cfg.get("wandb_scalar_iter", log_iter)
        val_iter = cfg.get("validation_iter", 10**12)
        # Dispatch windows must land exactly on every logging/val/ckpt
        # boundary: use the gcd of all active cadences.
        import math

        active = [c for c in (log_iter, scalar_iter, val_iter,
                              cfg.checkpoint.save_iter, cfg.checkpoint.save_latest_iter)
                  if c and c <= max_iter]
        cadence = math.gcd(*active) if active else max(max_iter - start_iter, 1)
        # Steps fused into one dispatched program. Default: the full cadence
        # window (device-resident data + in-step schedules make this safe).
        spd = cfg.trainer.get("steps_per_dispatch")
        # "auto": measure one real (post-compile) step, then size the window
        # to a wall-time budget. The worker-fault bisection (PERF.md) shows
        # the crash boundary tracks the per-WINDOW execution time of
        # scatter-heavy programs (~70 s crashes, ~30 s clean at the HBM
        # tier), so a time budget is the principled default — the static
        # mode/size table below stays for the non-auto path.
        auto_spd = isinstance(spd, str) and spd == "auto"
        if auto_spd:
            spd = 1
        if spd is None:
            # Scanned multi-step windows amortize per-dispatch host latency,
            # but too-large window PROGRAMS fault the TPU worker, and the
            # boundary depends on the per-step op count and model footprint
            # (PERF.md): at the 365M-param parity scale, the reference-exact
            # gradient path faults at 8+ steps (5 is clean) while the
            # shared-tap stencil's smaller program is soak-clean at 32
            # (faults at 40); small models (the 1.7M-param demo) run 32
            # clean on the exact path too. A faulted worker cannot be
            # recovered in-process (donated state is gone), so the default
            # is conservative per mode/size; override via
            # trainer.steps_per_dispatch.
            if jax.default_backend() == "cpu":
                spd = min(cadence, 100)
            else:
                grad_cfg = (cfg.model.get("object", {}).get("sdf", {}).get("gradient", {})
                            if "object" in cfg.model else {})
                stencil_on = bool(grad_cfg.get("shared_levels"))
                # Only default into MEASURED-safe windows (a worker fault is
                # unrecoverable in-process — donated state is lost): the
                # stencil program is soak-clean at 32 at the LARGEST (365M)
                # scale, so smaller programs inherit 32; the exact path is
                # only proven at 32 on the ~2M-param demo and at 5 at parity
                # scale, so every exact model above demo scale defaults to 5.
                # Users opt into larger windows via trainer.steps_per_dispatch.
                if stencil_on:
                    spd = min(cadence, 32)
                else:
                    spd = min(cadence, 32 if self.num_params < 4e6 else 5)
        spd = max(int(spd), 1)
        loops = {}  # (scan length, static max_levels) -> jitted loop

        def run(state, n, rng):
            key = (n, self._train_max_levels)
            if key not in loops:
                loops[key] = (self.build_train_step() if n == 1 else self.build_train_loop(n))
            return loops[key](state, arrays, rng)

        # Occupancy grid maintenance (opt-in; see ops/occupancy.py). The grid
        # rides into the step through `arrays`, refreshed from the SDF every
        # `update_every` iterations with one cheap jitted field evaluation.
        occ_cfg = (cfg.model.get("render") or {}).get("occupancy") if "render" in cfg.model else None
        occ_enabled = bool(occ_cfg and occ_cfg.get("enabled"))
        occ_update_fn = None
        occ_last_update = None
        if occ_enabled:
            from mlinerf_tpu.ops import occupancy as occ_ops

            res = int(occ_cfg.get("resolution", 64))
            hg = cfg.model.object.sdf.encoding.hashgrid
            rmin, rmax = float(hg.range[0]), float(hg.range[1])
            coords = jnp.asarray(occ_ops.grid_coordinates(res, rmin, rmax))[None]
            band = float(occ_cfg.get("band_cells", 3.0))

            @jax.jit
            def occ_update_fn(params, it):
                cond = self.make_cond(it)
                sdf = self.model.apply({"params": params}, coords, cond,
                                       method=self.model.sdf_only)[0, :, 0]
                return occ_ops.occupancy_from_sdf(sdf, res, rmin, rmax, band)

            occ_every = int(occ_cfg.get("update_every", 256))

        info = None
        t_window = time.time()
        iters_in_window = 0
        # Worker-fault auto-recovery (PERF.md "worker-fault bisection"): a
        # TPU worker crash mid-window loses the donated state, but training
        # is exactly resumable by construction (iteration-keyed sampling +
        # latest_checkpoint.txt). On a recoverable fault: reload the latest
        # checkpoint, re-upload the data from the host snapshot, halve the
        # dispatch window, and continue — converting the crash boundary from
        # a correctness cliff into an annealing knob so defaults can run
        # larger windows. Loss is bounded by the checkpoint cadence.
        fr_cfg = cfg.trainer.get("fault_recovery", {}) or {}
        fr_enabled = bool(fr_cfg.get("enabled", True))
        fr_max = int(fr_cfg.get("max_retries", 2))
        recoveries = 0
        arrays_host = None
        if fr_enabled:
            # Host snapshot for post-fault re-upload. train.py passes host
            # numpy (Dataset.as_arrays), so this is free there; device-array
            # callers pay one D2H copy.
            arrays_host = {k: np.asarray(v) for k, v in train_arrays.items()}
        self.watchdog.reset()
        it = start_iter
        while it < max_iter:
          try:  # worker-fault recovery boundary (see handler below)
              if occ_enabled and (occ_last_update is None or it - occ_last_update >= occ_every):
                  arrays["occupancy_grid"] = occ_update_fn(
                      state.params, jnp.asarray(it, jnp.int32)
                  )
                  self._last_occupancy_grid = arrays["occupancy_grid"]
                  occ_last_update = it
              n = min(spd, max_iter - it)
              # Never step across a cadence boundary.
              to_boundary = cadence - (it % cadence)
              n = min(n, to_boundary)
              self._train_max_levels = self.static_max_levels_for(it + n - 1)
              self.timer.start_iteration()
              if auto_spd and it > start_iter and (n, self._train_max_levels) in loops:
                  # Time one real step on an ALREADY-COMPILED program (a
                  # level-growth retrace would inflate the measurement), with
                  # a forced sync, then lock the window size. The wall time
                  # of a 1-step window is intercept + slope: on the remote
                  # tunnel the per-DISPATCH intercept is seconds to tens of
                  # seconds, so sizing from the raw wall time collapses the
                  # window to 1 and throughput with it. Measure the
                  # intercept with a trivial dispatch round-trip and
                  # subtract it — the budget governs DEVICE time per window
                  # (the worker-fault boundary tracks execution time).
                  t0 = time.time()
                  jax.device_get(jax.jit(lambda x: x + 1)(jnp.zeros(())))
                  intercept = time.time() - t0
                  t0 = time.time()
                  state, info = run(state, n, rng)
                  jax.device_get(info["total"])
                  t_window = time.time() - t0
                  t_step = max((t_window - intercept) / n, 1e-6)
                  budget = float(cfg.trainer.get("dispatch_time_budget", 45.0))
                  spd = max(min(int(budget // t_step), 32, cadence), 1)
                  auto_spd = False
                  print(f"[trainer] auto steps_per_dispatch: {t_step:.2f} s/step "
                        f"(+{intercept:.2f} s dispatch intercept) "
                        f"-> window {spd} (budget {budget:.0f} s)")
              else:
                  state, info = run(state, n, rng)
              it += n
              iters_in_window += n
              self.current_iteration = it
              self.current_epoch = it * cfg.data.train.batch_size // images_per_epoch
              if it % min(log_iter, scalar_iter) == 0 or it == max_iter:
                  info_host = jax.device_get(info)
                  total = float(info_host["total"])
                  if not np.isfinite(total):
                      self.state = state
                      from mlinerf_tpu.utils.console import alert
                      alert(f"Training loss is {total} at iteration {it}")
                      raise FloatingPointError(
                          f"Training loss is {total} at iteration {it} — aborting "
                          f"(NaN/Inf kill-switch, reference: projects/nerf/trainers/base.py:58)."
                      )
                  self.losses_host = {k: float(v) for k, v in info_host["losses"].items()}
                  self.metrics_host = {k: float(v) for k, v in info_host["metrics"].items()}
                  dt = (time.time() - t_window) / max(iters_in_window, 1)
                  t_window = time.time()
                  iters_in_window = 0
                  scalars = {
                      "train/total_loss": total,
                      "train/iter_time": dt,
                      "train/rays_per_sec": self.num_rand_rays() * cfg.data.train.batch_size / dt,
                      "optim/lr": float(self.lr_fn(it)),
                      "train/grad_norm": float(info_host["grad_norm"]),
                      **{f"train/loss/{k}": v for k, v in self.losses_host.items()},
                      **{f"train/{k}": v for k, v in self.metrics_host.items()},
                  }
                  self.logger.log_scalars(scalars, it)
                  if show_progress:
                      msg = ", ".join(f"{k.split('/')[-1]}={v:.4f}" for k, v in scalars.items()
                                      if "loss" in k or "psnr" in k.lower())
                      print(f"[iter {it}/{max_iter}] {msg} ({dt*1000:.1f} ms/it)")
                  self.watchdog.reset()
              if it % val_iter == 0 and val_dataset is not None:
                  self.state = state
                  self.validate(val_dataset, step=it)
              self._checkpoint_triggers(state, it)
          except Exception as exc:  # noqa: BLE001 - filtered below
            if (not fr_enabled or recoveries >= fr_max
                    or not _is_worker_fault(exc)):
                raise
            recoveries += 1
            print(f"[trainer] worker fault caught ({type(exc).__name__}): "
                  f"{str(exc)[:200]}")
            self.checkpointer.wait()
            restored = False
            try:
                restored = self.load_checkpoint(None, resume=True)
            except Exception as load_exc:  # noqa: BLE001
                print(f"[trainer] recovery load failed: {load_exc!r}")
            if not restored:
                print("[trainer] no checkpoint to recover from — re-raising "
                      "(enable checkpoint.save_latest_iter/save_period for "
                      "fault tolerance)")
                raise
            arrays = {k: jnp.asarray(v) for k, v in arrays_host.items()}
            occ_last_update = None
            loops.clear()
            state = self.state
            it = self.current_iteration
            spd = max(spd // 2, 1)
            auto_spd = False
            iters_in_window = 0
            t_window = time.time()
            self.watchdog.reset()
            print(f"[trainer] resumed from iteration {it}; "
                  f"steps_per_dispatch halved to {spd} "
                  f"(recovery {recoveries}/{fr_max})")
        self.state = state
        self.watchdog.disarm()
        self.checkpointer.wait()
        return info

    def _checkpoint_triggers(self, state, iteration: int):
        cfg = self.cfg
        save = False
        latest = False
        if iteration % cfg.checkpoint.save_iter == 0:
            save = True
        # Epoch-cadence saves (reference imaginaire/trainers/base.py:366-368):
        # fire when the epoch counter crosses a multiple of save_epoch —
        # crossing detection, since multi-step dispatch windows can advance
        # the epoch by more than one between trigger checks.
        save_epoch = cfg.checkpoint.get("save_epoch")
        if save_epoch:
            prev = getattr(self, "_ckpt_prev_epoch", 0)
            if self.current_epoch // save_epoch > prev // save_epoch:
                save = True
            self._ckpt_prev_epoch = self.current_epoch
        if iteration % cfg.checkpoint.save_latest_iter == 0:
            save, latest = True, True
        if self.checkpointer.reached_checkpointing_period():
            save, latest = True, True
        if save:
            self.save_checkpoint(state, iteration, latest=latest)

    def save_checkpoint(self, state=None, iteration=None, latest=False):
        state = state if state is not None else self.state
        iteration = iteration if iteration is not None else self.current_iteration
        payload = dict(
            params=state.params,
            opt_state=state.opt_state,
            ema_params=state.ema_params,
            iteration=int(iteration),
        )
        self.checkpointer.save(payload, self.current_epoch, iteration, latest=latest)

    def load_checkpoint(self, checkpoint_path: Optional[str] = None, resume: bool = False,
                        load_opt: bool = True):
        payload, path = self.checkpointer.load(checkpoint_path, resume=resume)
        if payload is None:
            print("[checkpoint] training from scratch")
            return False
        st = payload["state"]
        params = jax.tree.map(jnp.asarray, st["params"])
        new = dict(params=params)
        if st.get("iteration") is not None and (self.is_inference or resume):
            # The iteration is part of the model's effective state: schedules
            # (coarse2fine level mask, normal epsilon, NeuS cos anneal) are
            # derived from it, so inference on a trained checkpoint must
            # evaluate at the TRAINED iteration even without a full resume,
            # and a training resume continues from it.
            # (The reference only does this in extract_mesh.py:75 — its
            # test.py renders a freshly-loaded model with the coarse2fine
            # schedule implicitly reset; we fix rather than replicate.)
            # Training-side warm starts (resume=False) keep iteration 0.
            self.current_iteration = int(st["iteration"])
        if resume and load_opt and st.get("opt_state") is not None:
            new["opt_state"] = jax.tree.map(
                lambda t, s: jnp.asarray(s), self.state.opt_state, st["opt_state"]
            )
            new["iteration"] = jnp.asarray(st["iteration"], jnp.int32)
        if st.get("ema_params") is not None and self.ema_enabled:
            new["ema_params"] = jax.tree.map(jnp.asarray, st["ema_params"])
        self.state = self.state.replace(**new)
        print(f"[checkpoint] loaded {path} (iteration {st.get('iteration')})")
        self._reshard_state()
        return True

    # ------------------------------------------------------------------
    # Inference engine (full-image chunked rendering)
    # ------------------------------------------------------------------

    def eval_params(self):
        if self.ema_enabled and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def _inference_window(self, num_rays_chunk: int) -> int:
        """Chunks per dispatched render program.

        "auto" (default): 32 at the shipped fast semantics (r4d ladder at
        d19/64-sample shape: w8 63.3k / w16 62.1k / w32 71.0k rays/s, no
        fault) — but the 32-window was ladder-validated ONLY there, and the
        reference-parity shape (dict 2^22, 64+4x16 samples) OOM'd/faulted
        at large windows in round 1, so heavy configs keep the round-1..3
        validated 4-chunk window (round-4 ADVICE: defaults must be safe).
        Chunks > 4096 rays OOM when windowed at all -> per-chunk loop. An
        explicit int in runtime.inference_chunks_per_dispatch forces any
        window; 1 = the per-chunk loop.
        """
        wc_cfg = self.cfg.get("runtime", {}).get("inference_chunks_per_dispatch")
        if wc_cfg not in (None, "auto"):
            return int(wc_cfg)
        if num_rays_chunk > 4096:
            return 1
        if getattr(self, "_trained_in_process", False):
            # Post-training renders in the SAME process fault the worker at
            # the 32-chunk window (2/2 crashes at production shape, round-5
            # evidence: r5_prodscale_B_s1.attempt1_workerfault.log and
            # r5_stageb_prod_BI_s0 light renders), while every fresh
            # render-only process survived it (r4 inference ladder, 6 runs)
            # and every post-training render at 4 survived (all r4
            # prodscale validates). The worker's fragility tracks sustained
            # prior pressure, not the render program alone — so "auto"
            # keeps the proven 4-chunk window once train() has run here.
            return 4
        mcfg = self.cfg.model
        dict_size = (mcfg.get("object", {}).get("sdf", {})
                     .get("encoding", {}).get("hashgrid", {})
                     .get("dict_size", 0))
        rcfg = mcfg.get("render", {})
        ns = rcfg.get("num_samples", {})
        samples = (ns.get("coarse", 0)
                   + rcfg.get("num_sample_hierarchy", 0) * ns.get("fine", 0))
        heavy = dict_size >= 20 or samples > 96
        return 4 if heavy else 32

    def _eval_cond(self, cond_it, max_levels):
        """Schedule inputs for eval renders, with the static level cap."""
        cond = self.make_cond(cond_it)
        if max_levels is not None:
            cond = dict(cond)
            cond["max_levels"] = max_levels
        return cond

    def _render_image_fn(self, static_kwargs: Tuple = ((), None)):
        """One jitted program rendering a WINDOW of chunks of an image.

        The host chunk loop of the reference's ``ray_generator``
        (nerf_util.py:119-124) becomes a ``lax.map`` over fixed-size ray
        chunks inside a single dispatch — memory stays chunk-bounded while
        dispatch latency is paid once per window instead of per chunk.

        ``static_kwargs`` (a sorted kv-tuple) is forwarded to
        ``model.render_chunk`` — e.g. ``with_light_visibility=True`` for the
        pseudo-label renderer — and keys the jit cache.
        """
        cache = self.__dict__.setdefault("_render_image_fn_cache", {})
        if static_kwargs in cache:
            return cache[static_kwargs]
        extra, max_levels = dict(static_kwargs[0]), static_kwargs[1]

        @functools.partial(jax.jit, static_argnums=(5,))
        def fn(params, center, ray, cond_it, rng, num_rays_chunk, pts_light=None):
            cond = self._eval_cond(cond_it, max_levels)
            B, total = center.shape[0], center.shape[1]
            pad = (-total) % num_rays_chunk
            def prep(x):
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                return x.reshape(B, -1, num_rays_chunk, 3).swapaxes(0, 1)  # [C,B,R,3]
            center_c, ray_c = prep(center), prep(ray)
            light_c = prep(pts_light) if pts_light is not None else None

            def render_one(args):
                kwargs = dict(extra)
                if light_c is not None:
                    c, r, l = args
                    kwargs["pts_light"] = l
                else:
                    c, r = args
                out = self.model.apply({"params": params}, c, r, cond,
                                       rng=rng, method=self.model.render_chunk, **kwargs)
                # Keep only per-ray [B,R,K] tensors (drop per-sample fields
                # to bound memory across chunks).
                return {k: v for k, v in out.items()
                        if v is not None and hasattr(v, "ndim") and v.ndim == 3
                        and v.shape[1] == num_rays_chunk}

            args = (center_c, ray_c, light_c) if light_c is not None else (center_c, ray_c)
            outs = jax.lax.map(render_one, args)
            # [C,B,R,K] -> [B,C*R,K] -> trim padding
            outs = {k: v.swapaxes(0, 1).reshape(B, -1, v.shape[-1])[:, :total]
                    for k, v in outs.items()}
            return outs

        cache[static_kwargs] = fn
        return fn

    def _use_fused_inference(self) -> bool:
        """Fused (lax.map) full-image rendering — like the scanned train loop,
        large control-flow-wrapped programs fault some TPU runtimes at
        production model sizes; default to per-chunk dispatches there."""
        forced = self.cfg.get("runtime", {}).get("fused_inference")
        if forced is not None:
            return bool(forced)
        return jax.default_backend() == "cpu"

    def _render_chunk_fn(self, static_kwargs: Tuple = ((), None)):
        """Jitted single-chunk render, keyed on static render kwargs."""
        cache = self.__dict__.setdefault("_render_chunk_fn_cache", {})
        if static_kwargs in cache:
            return cache[static_kwargs]
        extra, max_levels = dict(static_kwargs[0]), static_kwargs[1]

        @jax.jit
        def fn(params, center, ray, cond_it, rng, pts_light=None):
            cond = self._eval_cond(cond_it, max_levels)
            kwargs = dict(extra)
            if pts_light is not None:
                kwargs["pts_light"] = pts_light
            out = self.model.apply(
                {"params": params}, center, ray, cond, rng=rng,
                method=self.model.render_chunk, **kwargs,
            )
            return {k: v for k, v in out.items()
                    if v is not None and hasattr(v, "ndim") and v.ndim == 3
                    and v.shape[1] == center.shape[1]}

        cache[static_kwargs] = fn
        return fn

    def render_image(self, data: Dict[str, np.ndarray], image_size,
                     num_rays_chunk: Optional[int] = None,
                     render_kwargs: Optional[Dict[str, Any]] = None) -> Dict[str, np.ndarray]:
        """Render full images (fused dispatch on CPU; chunked on TPU).

        The single shared renderer behind validation, the inference suite,
        and the pseudo-label (`render_image_light`) pass — fused, windowed,
        and per-chunk dispatch strategies all live here.
        """
        H, W = image_size
        num_rays_chunk = int(num_rays_chunk or self.num_val_rays())
        # Static render config: extra render_chunk kwargs + the window-static
        # coarse2fine level cap at the CURRENT iteration (keeps eval taps on
        # the same exact/shared split as training — the traced level_mask
        # stays authoritative, the cap only skips levels it would zero).
        skw = (tuple(sorted((render_kwargs or {}).items())),
               self.static_max_levels_for(self.current_iteration))
        pose = jnp.asarray(data["pose"])
        intr = jnp.asarray(data["intr"])
        center, ray = camera.get_center_and_ray(pose, intr, (H, W))
        pts_light = None
        if "pose_light" in data and self._needs_light():
            light_center = camera.get_camera_center(jnp.asarray(data["pose_light"]), num_pixels=1)
            pts_light = jnp.broadcast_to(light_center, ray.shape)
        num_rays_chunk = min(num_rays_chunk, H * W)
        params = self.eval_params()
        rng = jax.random.PRNGKey(0)
        it = jnp.asarray(self.current_iteration, jnp.int32)
        if self._use_fused_inference():
            out = self._render_image_fn(skw)(
                params, center, ray, it, rng, num_rays_chunk, pts_light=pts_light,
            )
            return jax.device_get(out)
        total = H * W
        # Windowed dispatches: `runtime.inference_chunks_per_dispatch` chunks
        # render per dispatched program (lax.map over the window), amortizing
        # the per-dispatch host latency the same way the scanned train windows
        # do. "auto" (the default) applies a 32-chunk window for chunks
        # <= 4096 rays (r4d ladder at the shipped default, 512x512
        # production shape: w8 63.3k / w16 62.1k / w32 71.0k rays/s —
        # docs/round4_evidence/bench_logs/r4_inf_w*.log; no fault, no OOM)
        # and falls back to the per-chunk loop for larger chunks (8192-ray
        # chunks OOM when windowed). An explicit int forces that window;
        # 1 = the per-chunk loop (the all-chunks lax.map faults some TPU
        # runtimes at production size — see PERF.md).
        wc = self._inference_window(num_rays_chunk)
        if wc > 1:
            window = wc * num_rays_chunk
            render_fn = self._render_image_fn(skw)
            chunks = []
            for c0 in range(0, total, window):
                c1 = min(c0 + window, total)
                pad = window - (c1 - c0)
                sl = lambda x: (jnp.pad(x[:, c0:c1], ((0, 0), (0, pad), (0, 0)))
                                if pad else x[:, c0:c1])
                out = render_fn(
                    params, sl(center), sl(ray), it, rng, num_rays_chunk,
                    pts_light=sl(pts_light) if pts_light is not None else None,
                )
                chunks.append({k: np.asarray(v)[:, : c1 - c0]
                               for k, v in jax.device_get(out).items()})
            return {k: np.concatenate([c[k] for c in chunks], axis=1) for k in chunks[0]}
        # Host chunk loop (one dispatch per fixed-size chunk).
        render_fn = self._render_chunk_fn(skw)
        chunks = []
        for c0 in range(0, total, num_rays_chunk):
            c1 = min(c0 + num_rays_chunk, total)
            pad = num_rays_chunk - (c1 - c0)
            sl = lambda x: jnp.pad(x[:, c0:c1], ((0, 0), (0, pad), (0, 0))) if pad else x[:, c0:c1]
            out = render_fn(
                params, sl(center), sl(ray), it, rng,
                pts_light=sl(pts_light) if pts_light is not None else None,
            )
            chunks.append({k: np.asarray(v)[:, : c1 - c0] for k, v in jax.device_get(out).items()})
        return {k: np.concatenate([c[k] for c in chunks], axis=1) for k in chunks[0]}

    def inference_outputs(self, data, image_size) -> Dict[str, np.ndarray]:
        """Full inference pass returning *_map images [B,H,W,C]."""
        out = self.render_image(data, image_size)
        H, W = image_size
        to_map = lambda x: x.reshape(x.shape[0], H, W, -1)
        maps = {}
        maps["rgb_map"] = to_map(out["rgb"])
        if "opacity" in out:
            maps["opacity_map"] = to_map(out["opacity"])
        if "depth" in out:
            maps["depth_map"] = to_map(out["depth"])
        if "gradient" in out:
            rot = np.asarray(data["pose"])[..., :3, :3]
            normal_cam = -out["gradient"] @ np.swapaxes(rot, -1, -2)
            maps["normal_map"] = to_map(normal_cam)
        for key in ("o_r", "o_s", "o_re"):
            if key in out:
                maps[key + "_map"] = to_map(out[key])
        for key in ("visibility", "normal_x_light", "pseudo_shading", "inter_dist", "inter_mask"):
            if key in out:
                maps[key + "_map"] = to_map(out[key].astype(np.float32))
        maps["_raw"] = out
        return maps

    def validate(self, val_dataset, step: int, max_samples: int = 4):
        """Validation loop: render, compute losses/PSNR, log images."""
        image_size = self.cfg.data.val.image_size
        psnrs = []
        comp_psnrs = {}  # intrinsic-component PSNR vs GT iid maps
        logged_images = {}

        def _psnr(a, b):
            return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)

        for i in range(min(len(val_dataset), max_samples)):
            sample = val_dataset[i]
            data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
            data["idx"] = np.asarray([sample["idx"]])
            maps = self.inference_outputs(data, image_size)
            gt = np.asarray(sample["image"])  # [H,W,3]
            pred = maps["rgb_map"][0]
            psnrs.append(_psnr(pred, gt))
            # Component PSNR when the dataset carries GT intrinsics
            # (data.*.load_iid — synthetic scenes and the Blender iid
            # loader). The reference scores Reflectance directly and
            # Shading gamma-corrected 1/2.2 (compute_metrics.py:38-112).
            if "Ref" in sample and "o_r_map" in maps:
                comp_psnrs.setdefault("psnr_ref", []).append(
                    _psnr(maps["o_r_map"][0], np.asarray(sample["Ref"])))
            if "Sha" in sample and "o_s_map" in maps:
                sha_pred = np.clip(maps["o_s_map"][0], 0, 1) ** (1 / 2.2)
                sha_gt = np.clip(np.asarray(sample["Sha"]), 0, 1) ** (1 / 2.2)
                if sha_gt.ndim == 2:
                    sha_gt = sha_gt[..., None]
                if sha_pred.shape[-1] != sha_gt.shape[-1]:
                    sha_pred = sha_pred.mean(-1, keepdims=True)
                    sha_gt = sha_gt.mean(-1, keepdims=True)
                comp_psnrs.setdefault("psnr_sha", []).append(_psnr(sha_pred, sha_gt))
            if i == 0:
                logged_images["val/rgb_render"] = pred
                logged_images["val/rgb_target"] = gt
                if "normal_map" in maps:
                    logged_images["val/normal"] = maps["normal_map"][0] * 0.5 + 0.5
        scalars = {"val/psnr": float(np.mean(psnrs))}
        scalars.update({f"val/{k}": float(np.mean(v)) for k, v in comp_psnrs.items()})
        self.logger.log_scalars(scalars, step)
        self.logger.log_images(logged_images, step)
        comp_msg = "".join(f", {k.split('_')[1]} {np.mean(v):.2f}"
                           for k, v in sorted(comp_psnrs.items()))
        print(f"[val @ {step}] PSNR = {np.mean(psnrs):.2f} dB{comp_msg}")
        return float(np.mean(psnrs))
