"""Nested-dict array stores for pseudo-label artifacts (npz-backed).

Replaces the reference's torch ``.pt`` dict-of-dicts files
(``results_all.pt``, ``pseudo_label_all.pt``). Keys are flattened with '/'
into a single compressed npz; ``load`` rebuilds the nesting. A torch ``.pt``
reader is provided for interop with artifacts produced by the reference
(torch is CPU-available in this environment but never on the compute path).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

_SEP = "||"


def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_results_all(results: Dict[str, Any], path: str):
    """Save a nested dict of arrays to ``path``(.npz)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(results))


def load_results_all(path: str) -> Dict[str, Any]:
    """Load a nested dict store; supports .npz (ours) and .pt (reference)."""
    if path.endswith(".pt") or (not os.path.exists(path) and os.path.exists(path + ".pt")):
        return _load_torch(path if path.endswith(".pt") else path + ".pt")
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def _load_torch(path: str) -> Dict[str, Any]:
    import torch  # CPU-only interop path

    obj = torch.load(path, map_location="cpu")

    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if hasattr(x, "numpy"):
            return x.numpy()
        return np.asarray(x)

    return conv(obj)
