#!/usr/bin/env python
"""Full-image inference throughput at the bench workload.

Renders one 512x512 validation image through the shared windowed renderer
(trainers/base.py render_image — the same path validation, the inference
suite, and the pseudo-label light pass use) and reports warm rays/s.

Env: the bench.py config knobs (BENCH_DICT_SIZE/BENCH_LEVELS/BENCH_DIM/
BENCH_COARSE/BENCH_HIER/BENCH_SHARED_LEVELS), plus
  INF_CHUNK  rays per chunk (default 4096)
  INF_WINDOW chunks per dispatched program (default 4 — the validated
             4096x4 recipe, PERF.md)
  INF_REPEATS timed warm renders (default 2; median reported)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench
    from mlinerf_tpu.config import resolve

    cfg = bench.build_bench_cfg()
    chunk = int(os.environ.get("INF_CHUNK", 4096))
    window = int(os.environ.get("INF_WINDOW", 4))
    repeats = int(os.environ.get("INF_REPEATS", 2))
    cfg.model.render.rand_rays_val = chunk
    cfg.runtime.inference_chunks_per_dispatch = window
    if os.environ.get("BENCH_SMALL"):
        cfg.model.object.sdf.encoding.hashgrid.dict_size = 15
        cfg.data.train.image_size = [64, 64]
        cfg.data.val.image_size = [64, 64]

    Dataset = resolve("dataset", cfg.data.type)
    ds = Dataset(cfg, is_inference=True)
    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, is_inference=True, logdir="/tmp/mlinerf_bench_inf")
    H, W = cfg.data.val.image_size
    sample = ds.get_full_sample(0)
    import numpy as np

    data = {k: np.asarray(v)[None] for k, v in sample.items()
            if k in ("pose", "intr", "pose_light")}
    out = trainer.render_image(data, (H, W))  # compile + warm
    assert np.isfinite(out["rgb"]).all()
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = trainer.render_image(data, (H, W))
        times.append(time.time() - t0)
    times.sort()
    dt = times[len(times) // 2]
    print(json.dumps({
        "metric": "inference_rays_per_sec",
        "value": round(H * W / dt, 1),
        "unit": "rays/s",
        "chunk": chunk,
        "chunks_per_dispatch": window,
        "render_times_s": [round(t, 2) for t in times],
    }))


if __name__ == "__main__":
    main()
