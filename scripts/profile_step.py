#!/usr/bin/env python
"""Profile the stage-a train step and print a device-op time breakdown.

TPU counterpart of the reference's ``--profile`` torch.autograd.profiler table
(imaginaire/trainers/base.py:500-521): capture a ``jax.profiler`` trace of a
few bench-workload steps and aggregate device-plane event durations by HLO op
category (mlinerf_tpu/utils/profiling.py). This produced the scatter/gather
breakdown tables in PERF.md.

Env: BENCH_SHARED_LEVELS / BENCH_CONFIG / BENCH_SMALL as in bench.py;
PROFILE_STEPS (default 2), PROFILE_DIR (default /tmp/mlinerf_profile),
PROFILE_SPD (default 1) — with PROFILE_SPD>1 each "step" is a fused
steps_per_dispatch window (build_train_loop), the program production
training and bench.py actually run; the standalone single-step program has
shown a memory-space-assignment slice/copy pathology (PERF.md) that the
scanned program does not.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench
    from mlinerf_tpu.utils import profiling

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
    spd = int(os.environ.get("PROFILE_SPD", 1))
    step = trainer.build_train_loop(spd) if spd > 1 else trainer.build_train_step()
    state = trainer.state
    rng = jax.random.PRNGKey(0)
    state, info = step(state, arrays, rng)  # compile + warm
    float(jax.device_get(info["total"]))
    with jax.profiler.trace(profile_dir):
        for _ in range(steps):
            state, info = step(state, arrays, rng)
        float(jax.device_get(info["total"]))
    print(f"[profile] {steps} x {spd}-step dispatches traced to {profile_dir}")
    profiling.print_breakdown(profile_dir)


if __name__ == "__main__":
    main()
