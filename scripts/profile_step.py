#!/usr/bin/env python
"""Profile the stage-a train step and print a device-op time breakdown.

TPU counterpart of the reference's ``--profile`` torch.autograd.profiler table
(imaginaire/trainers/base.py:500-521): capture a ``jax.profiler`` trace of a
few bench-workload steps, parse the XSpace protobuf, and aggregate device-plane
event durations by HLO op category. This produced the scatter/gather breakdown
tables in PERF.md.

Env: BENCH_SHARED_LEVELS / BENCH_SMALL as in bench.py; PROFILE_STEPS (default 2),
PROFILE_DIR (default /tmp/mlinerf_profile).
"""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    """Coarse HLO-op category from an event name."""
    n = name.lower()
    for key, cat in (
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
    ):
        if key in n:
            return cat
    return "other"


def aggregate(xspace_path: str):
    # The tsl protos shipped inside the tensorflow wheel parse the XSpace
    # written by jax.profiler (the tensorboard_plugin_profile copies are
    # stale-codegen and fail to import under protobuf>=4).
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(xspace_path, "rb") as f:
        xspace.ParseFromString(f.read())
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
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
    return per_op, per_cat, total


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    profile_dir = os.environ.get("PROFILE_DIR", "/tmp/mlinerf_profile")
    steps = int(os.environ.get("PROFILE_STEPS", 2))
    cfg = bench.build_bench_cfg()
    if os.environ.get("BENCH_SMALL"):
        cfg.model.object.sdf.encoding.hashgrid.dict_size = 15
        cfg.data.train.image_size = [64, 64]
        cfg.data.val.image_size = [64, 64]
        cfg.model.render.rand_rays = 256

    from mlinerf_tpu.config import resolve

    Dataset = resolve("dataset", cfg.data.type)
    arrays = {k: jax.numpy.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, logdir="/tmp/mlinerf_profile_logs")
    step = trainer.build_train_step()
    state = trainer.state
    rng = jax.random.PRNGKey(0)
    state, info = step(state, arrays, rng)  # compile + warm
    float(jax.device_get(info["total"]))
    with jax.profiler.trace(profile_dir):
        for _ in range(steps):
            state, info = step(state, arrays, rng)
        float(jax.device_get(info["total"]))

    paths = sorted(glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    per_op, per_cat, total = aggregate(paths[-1])
    print(f"\n== device time by category ({steps} steps, total {total:.3f} s) ==")
    for cat, t in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:>18}: {t:8.3f} s  {100 * t / max(total, 1e-12):5.1f}%")
    print("\n== top 20 ops ==")
    for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{t:8.3f} s  {100 * t / max(total, 1e-12):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
