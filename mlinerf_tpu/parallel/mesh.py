"""Device mesh and sharding strategy.

The reference scales with one-process-per-GPU DDP over NCCL
(imaginaire/utils/distributed.py, get_trainer.py:80-88). The TPU-native
replacement is a single-controller ``jax.sharding.Mesh``:

  * the per-step **ray axis** is sharded across chips (the models are small
    MLPs + a replicated hash table; rays are the scalable axis — SURVEY §2.5);
  * parameters/optimizer state are replicated; XLA inserts the gradient
    ``psum`` over ICI automatically from the sharding constraints — that one
    collective IS the whole DDP apparatus;
  * eval collation (reference all_gather + dedupe, projects/nerf/utils/
    misc.py:18-60) disappears: outputs of the jitted step are already global
    arrays under the single-controller model;
  * multi-host runs initialize with ``jax.distributed.initialize`` and use
    the same code path (mesh spans all processes' devices).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
BATCH_AXIS = "batch"


def init_multihost(cfg) -> bool:
    """Initialize cross-host JAX (DCN) from ``runtime.multihost``.

    Executable counterpart of the reference's ``init_dist``
    (imaginaire/utils/distributed.py:21-27, torch.distributed NCCL init): on
    a multi-host TPU slice every host runs this same script, and
    ``jax.distributed.initialize`` wires the DCN coordination layer so
    ``jax.devices()`` spans the whole slice — after which the existing 1-D
    mesh / sharding code is unchanged (the mesh simply covers more chips).

    Config (``runtime.multihost``):
      * ``false``/absent — no-op (single host), returns False;
      * ``true`` — auto-detect (TPU pod metadata provides coordinator and
        process ids; the standard JAX pod bring-up);
      * a mapping with ``coordinator_address`` / ``num_processes`` /
        ``process_id`` (each optional, env-overridable via
        ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
        ``JAX_PROCESS_ID``) — explicit bring-up for non-TPU fleets.

    Must run before any other jax call. Idempotent: re-initialization
    attempts are ignored (jax raises if already initialized).
    """
    import os

    mh = (cfg.get("runtime", {}) or {}).get("multihost", False)
    if not mh:
        return False
    kwargs = {}
    if isinstance(mh, dict):
        for cfg_key, env_key in (
            ("coordinator_address", "JAX_COORDINATOR_ADDRESS"),
            ("num_processes", "JAX_NUM_PROCESSES"),
            ("process_id", "JAX_PROCESS_ID"),
        ):
            val = os.environ.get(env_key, mh.get(cfg_key))
            if val is not None:
                kwargs[cfg_key] = int(val) if cfg_key != "coordinator_address" else str(val)
    if jax.distributed.is_initialized():
        return True
    jax.distributed.initialize(**kwargs)
    return True


def is_main_process() -> bool:
    """True on the process that owns logging/checkpoint writes.

    Multi-host discipline (reference ``is_master()`` gating,
    imaginaire/utils/distributed.py): exactly one process writes logs,
    checkpoints and TensorBoard events; the others compute. Single-host
    (process_count == 1) is always main.
    """
    return jax.process_index() == 0


def sync_processes(name: str = "barrier") -> None:
    """Cross-process barrier (no-op single-host).

    Reference ``dist.barrier()`` (imaginaire/utils/distributed.py:87-98).
    Used by test.py so non-main processes wait for process 0's render
    instead of exiting early and tripping the coordinator's peer-failure
    detection.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def get_mesh(strategy: str = "rays", devices=None) -> Optional[Mesh]:
    """Build a 1-D mesh over all devices (or None to disable sharding)."""
    if strategy in (None, "none", False):
        return None
    devices = devices if devices is not None else jax.devices()
    axis = RAY_AXIS if strategy == "rays" else BATCH_AXIS
    return Mesh(np.asarray(devices), (axis,))


def shard_rays(mesh: Optional[Mesh], x, axis: int = 1):
    """Constrain an array to be sharded along its ray axis.

    Layout [B, R, ...]: R is split over the mesh. When the ray count does not
    divide the device count (or mesh is None) the array stays replicated.
    """
    if mesh is None or x is None:
        return x
    n = mesh.devices.size
    if x.ndim <= axis or x.shape[axis] % n != 0:
        return x
    spec = [None] * x.ndim
    spec[axis] = mesh.axis_names[0]
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def shard_rays_tree(mesh: Optional[Mesh], batch: Dict, ray_axis_keys: Iterable[str] = ()):
    """Apply ray-axis sharding constraints to the per-ray entries of a batch.

    Keys listed in ``ray_axis_keys`` and any '[B,R,...]'-shaped pixel tensors
    (keys ending in '_sampled') are constrained; small per-image tensors stay
    replicated.
    """
    if mesh is None:
        return batch
    out = {}
    for key, value in batch.items():
        if key in ray_axis_keys or key.endswith("_sampled"):
            out[key] = shard_rays(mesh, value, axis=1)
        else:
            out[key] = value
    return out


def partial_grad_specs(mesh: Optional[Mesh], batch: Dict,
                       ray_axis_keys: Iterable[str] = ()):
    """PartitionSpecs for the batch under the shard_map partial-grad layout.

    ``runtime.grad_psum`` (see trainers/base.py) computes table gradients
    per-device from the local ray shard and combines them with one
    ``pmean`` — the explicit DDP layout the reference gets from NCCL
    all-reduce (imaginaire/trainers/utils/get_trainer.py:80-88). Under the
    default constraint layout XLA instead all-gathers the scatter OPERANDS
    (~1.26 GB/step at the bench shape, PERF.md round 4); this layout moves
    only the summed table gradient (~268 MB fp32 at d19) — the 5-10x comm
    cut identified there.

    Returns a spec pytree matching ``batch`` (ray-axis entries split over
    the mesh, everything else replicated), or None when the ray count does
    not divide the mesh — the caller falls back to the constraint layout.
    """
    if mesh is None:
        return None
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    ray_axis_keys = set(ray_axis_keys)
    specs = {}
    for key, value in batch.items():
        is_ray = key in ray_axis_keys or key.endswith("_sampled")
        if is_ray:
            if getattr(value, "ndim", 0) < 2 or value.shape[1] % n != 0:
                return None  # all-or-nothing: mixed ray counts can't split
            specs[key] = P(*([None, axis] + [None] * (value.ndim - 2)))
        else:
            specs[key] = P()
    return specs


def replicate(mesh: Optional[Mesh], tree):
    """Mark a pytree fully replicated over the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_hash_tables(mesh: Optional[Mesh], tree, min_rows: int = 8192):
    """ZeRO-style row-sharding of hash-table state over the mesh.

    The hash tables are by far the largest state (2^22 rows x 16 levels plus
    two fp32 Adam moments each — ~5.3 GB at the reference configuration,
    dwarfing the MLPs). Row-sharding every ``hash_table`` leaf (params, both
    optimizer moments, EMA) over the mesh:

      * divides optimizer/EMA memory and the table *update* work by the
        device count,
      * turns the table-gradient combine into a reduce-scatter (each chip
        reduces only its row shard) instead of a full psum of the 2.1 GB
        fp32 gradient,
      * costs one bf16 all-gather of the live table per step for the
        encoder's gathers — ~1 GB over ICI, cheap next to the scatter work
        it balances.

    The reference has no analog (DDP replicates everything;
    imaginaire/trainers/utils/get_trainer.py:80-88). Non-table leaves are
    replicated; table levels whose row count does not divide the mesh (odd
    dense resolutions) or is below ``min_rows`` stay replicated too.
    """
    if mesh is None:
        return tree
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    row_sharded = NamedSharding(mesh, P(axis, None))
    replicated = NamedSharding(mesh, P())

    def put(path, x):
        if x is None or np.isscalar(x):
            return x
        path_str = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if ("hash_table" in path_str and getattr(x, "ndim", 0) == 2
                and x.shape[0] % n == 0 and x.shape[0] >= min_rows):
            return jax.device_put(x, row_sharded)
        return jax.device_put(x, replicated)

    return jax.tree_util.tree_map_with_path(put, tree)
