"""XSpace (jax.profiler) trace aggregation: per-HLO device-time breakdown.

TPU counterpart of the reference's ``--profile`` top-op table
(imaginaire/trainers/base.py:500-521, torch.autograd.profiler key_averages):
parse the ``*.xplane.pb`` a ``jax.profiler.trace`` context wrote and aggregate
device-plane event durations by op and by HLO category.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Tuple

_CATEGORIES = (
    ("scatter", "scatter"),
    ("gather", "gather"),
    ("dynamic-update-slice", "dyn-update-slice"),
    ("dynamic-slice", "dyn-slice"),
    ("convolution", "conv"),
    ("dot", "dot"),
    ("fusion", "fusion"),
    ("copy", "copy"),
    ("all-reduce", "all-reduce"),
    ("sort", "sort"),
    ("reduce", "reduce"),
)


def categorize(name: str) -> str:
    """Coarse HLO-op category from an event name."""
    n = name.lower()
    for key, cat in _CATEGORIES:
        if key in n:
            return cat
    return "other"


def latest_xplane(profile_dir: str) -> str:
    paths = sorted(glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {profile_dir}")
    return paths[-1]


def aggregate(xspace_path: str) -> Tuple[Dict[str, float], Dict[str, float], float]:
    """Returns (seconds by op, seconds by category, total device seconds)."""
    # The tsl protos shipped inside the tensorflow wheel parse the XSpace
    # written by jax.profiler (the tensorboard_plugin_profile copies are
    # stale-codegen and fail to import under protobuf>=4).
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(xspace_path, "rb") as f:
        xspace.ParseFromString(f.read())
    per_op: Dict[str, float] = defaultdict(float)
    per_cat: Dict[str, float] = defaultdict(float)
    total = 0.0

    def consume(plane, line):
        nonlocal total
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            dur = ev.duration_ps / 1e12
            name = meta.display_name or meta.name
            per_op[name] += dur
            per_cat[categorize(name)] += dur
            total += dur

    # TPU/GPU: per-HLO durations live in "XLA Ops" lines of /device: planes.
    device_planes = [p for p in xspace.planes
                     if "/device:" in p.name or "TPU" in p.name]
    for plane in device_planes:
        for line in plane.lines:
            if "xla op" in line.name.lower() or line.name.lower() == "xla ops":
                consume(plane, line)
    if total == 0.0:
        # CPU fallback: codegen op events on the host plane.
        for plane in xspace.planes:
            for line in plane.lines:
                if "xla-cpu-codegen" in line.name or "XLAEigen" in line.name:
                    consume(plane, line)
    return dict(per_op), dict(per_cat), total


def print_breakdown(profile_dir: str, top: int = 20) -> None:
    """Print the category table + top ops for the newest trace in a dir."""
    try:
        path = latest_xplane(profile_dir)
    except FileNotFoundError as e:
        print(f"[profile] {e}")
        return
    try:
        per_op, per_cat, total = aggregate(path)
    except ImportError as e:  # tensorflow wheel absent
        print(f"[profile] trace saved to {path}; breakdown unavailable ({e})")
        return
    print(f"\n== device time by category (total {total:.3f} s) ==")
    for cat, t in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:>18}: {t:8.3f} s  {100 * t / max(total, 1e-12):5.1f}%")
    print(f"\n== top {top} ops ==")
    for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t:8.3f} s  {100 * t / max(total, 1e-12):5.1f}%  {name[:110]}")
