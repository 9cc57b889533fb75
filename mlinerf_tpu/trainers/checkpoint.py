"""Checkpointing: async background saves, ``latest_checkpoint.txt`` pointer,
resume with optimizer/schedule state, non-strict cross-stage warm starts.

Capability parity with the reference ``Checkpointer``
(imaginaire/trainers/base.py:557-687): save every N iterations / epochs /
minutes, latest-pointer bookkeeping, strict and non-strict restore. State is
host-transferred and written on a worker thread so the TPU never stalls on
disk IO.
"""

from __future__ import annotations

import os
import pickle
import threading
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def fetch_to_host(tree):
    """Transfer a pytree to host numpy, gathering cross-host shards.

    ``jax.device_get`` raises on arrays that are not fully addressable from
    this process (e.g. hash tables row-sharded across hosts by
    ``runtime.shard_tables`` under ``runtime.multihost``). Those leaves are
    assembled with a collective ``process_allgather`` instead — which is why
    this MUST be called from every process (it is: ``Checkpointer.save``
    runs it before its ``enabled`` gate, so non-main processes participate
    in the collective even though only process 0 writes the file).
    """
    leaves = jax.tree.leaves(tree)
    if not any(isinstance(x, jax.Array) and not x.is_fully_addressable
               for x in leaves):
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


def _flatten_dict(d, prefix=""):
    """Flatten nested dicts AND tuple/list leaves (e.g. per-level hash
    tables) into path -> array entries."""
    out = {}
    items = d.items() if isinstance(d, dict) else enumerate(d)
    for k, v in items:
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict) or isinstance(v, (tuple, list)):
            out.update(_flatten_dict(v, path))
        else:
            out[path] = v
    return out


def _set_path(d, path, value):
    keys = path.split("/")
    node = d
    for k in keys[:-1]:
        node = node[int(k)] if isinstance(node, list) else node[k]
    last = keys[-1]
    if isinstance(node, list):
        node[int(last)] = value
    else:
        node[last] = value


class Checkpointer:
    """Saves/loads training state dicts (pure pytrees of numpy arrays)."""

    def __init__(self, cfg, logdir: str, enabled: bool = True):
        # ``enabled=False`` (non-main processes on multi-host runs): saves
        # become no-ops, loads still work on every process — the reference's
        # is_master()-gated save / all-rank load split.
        self.enabled = enabled
        self.cfg = cfg
        self.logdir = logdir
        self.save_iter = cfg.checkpoint.save_iter
        self.save_latest_iter = cfg.checkpoint.save_latest_iter
        self.save_epoch = cfg.checkpoint.save_epoch
        self.save_period = cfg.checkpoint.save_period  # minutes
        self.strict_resume = cfg.checkpoint.get("strict_resume", True)
        self._last_period_save = time.time()
        self._save_thread: Optional[threading.Thread] = None
        os.makedirs(logdir, exist_ok=True)

    # ------------------------------------------------------------------

    def _checkpoint_name(self, epoch: int, iteration: int) -> str:
        return f"epoch_{epoch:05d}_iteration_{iteration:09d}_checkpoint.pkl"

    def reached_checkpointing_period(self) -> bool:
        if (time.time() - self._last_period_save) > self.save_period * 60:
            self._last_period_save = time.time()
            return True
        return False

    def save(self, state: Dict[str, Any], epoch: int, iteration: int, latest: bool = False):
        """Snapshot state to disk on a background thread.

        The host fetch happens BEFORE the ``enabled`` gate: on multi-host
        runs with cross-host-sharded state it is a collective
        (``fetch_to_host``), so every process must reach it — only the file
        write below is process-0-only.
        """
        state_host = fetch_to_host(state)
        if not self.enabled:
            return
        name = "latest_checkpoint.pkl" if latest else self._checkpoint_name(epoch, iteration)
        payload = dict(state=state_host, epoch=epoch, iteration=iteration)
        self.wait()  # at most one outstanding save

        def _worker():
            path = os.path.join(self.logdir, name)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)
            self.write_latest_checkpoint_file(name)

        self._save_thread = threading.Thread(target=_worker, daemon=True)
        self._save_thread.start()

    def wait(self):
        if self._save_thread is not None and self._save_thread.is_alive():
            self._save_thread.join()

    def write_latest_checkpoint_file(self, basename: str):
        with open(os.path.join(self.logdir, "latest_checkpoint.txt"), "w") as f:
            f.write(basename + "\n")

    def read_latest_checkpoint_file(self) -> Optional[str]:
        path = os.path.join(self.logdir, "latest_checkpoint.txt")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            name = f.readline().strip()
        return os.path.join(self.logdir, name) if name else None

    # ------------------------------------------------------------------

    @staticmethod
    def load_file(path: str) -> Dict[str, Any]:
        if path.endswith(".txt"):
            with open(path) as f:
                name = f.readline().strip()
            if not name:
                raise FileNotFoundError(f"Empty latest pointer {path}")
            path = os.path.join(os.path.dirname(path), name)
        with open(path, "rb") as f:
            return pickle.load(f)

    def load(self, checkpoint_path: Optional[str] = None, resume: bool = False):
        """Resolve (explicit path > latest pointer > None) and load.

        Returns (payload or None, loaded_from_path or None).
        """
        path = checkpoint_path or self.read_latest_checkpoint_file()
        if path is None or not os.path.exists(path):
            return None, None
        return self.load_file(path), path


def nonstrict_restore(target_params: Dict[str, Any], source_params: Dict[str, Any]):
    """Copy matching leaves from source into target; report mismatches.

    TPU-native equivalent of ``load_state_dict(strict=False)`` used for the
    stage-a -> stage-b warm start (projects/NeuralLumen/trainer.py:27-42).
    Leaves match when both path and shape agree.
    """
    flat_target = _flatten_dict(target_params)
    flat_source = _flatten_dict(source_params)
    missing, unexpected, mismatched = [], [], []
    import copy

    def tuples_to_lists(node):
        if isinstance(node, dict):
            return {k: tuples_to_lists(v) for k, v in node.items()}
        if isinstance(node, (tuple, list)):
            return [tuples_to_lists(v) for v in node]
        return node

    def lists_to_tuples(node, template):
        if isinstance(template, dict):
            return {k: lists_to_tuples(node[k], template[k]) for k in template}
        if isinstance(template, tuple):
            return tuple(lists_to_tuples(n, t) for n, t in zip(node, template))
        if isinstance(template, list):
            return [lists_to_tuples(n, t) for n, t in zip(node, template)]
        return node

    out = tuples_to_lists(copy.deepcopy(target_params))
    for path, val in flat_source.items():
        if path not in flat_target:
            unexpected.append(path)
            continue
        if np.shape(flat_target[path]) != np.shape(val):
            mismatched.append(path)
            continue
        _set_path(out, path, val)
    for path in flat_target:
        if path not in flat_source:
            missing.append(path)
    out = lists_to_tuples(out, target_params)
    return out, dict(missing=missing, unexpected=unexpected, mismatched=mismatched)
