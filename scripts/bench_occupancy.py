#!/usr/bin/env python
"""Measure the occupancy-sampling lever on the bench workload (TPU).

Variants (env OCC_VARIANT):
  parity  — occupancy ON, reference sample budget (64 + 4x16): measures the
            overhead of the grid march + inverse-CDF placement at equal cost.
  half    — occupancy ON, halved budget (32 + 2x16 = 64 samples/ray): the
            projected round-2 configuration; speed only — quality needs a
            real-data study before this can become a default.
  uhalf   — occupancy OFF, halved budget: control separating the cost of
            the occupancy march from the effect of the sample budget.

Run each variant in a FRESH process (a prior faulted/step-heavy client can
poison the TPU worker). Prints one JSON line like bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mlinerf_tpu.config import resolve
    from mlinerf_tpu.ops import occupancy as occ_ops

    variant = os.environ.get("OCC_VARIANT", "parity")
    cfg = bench.build_bench_cfg()
    if os.environ.get("BENCH_SMALL"):
        cfg.model.object.sdf.encoding.hashgrid.dict_size = 15
        cfg.data.train.image_size = [64, 64]
        cfg.data.val.image_size = [64, 64]
        cfg.model.render.rand_rays = 256
    cfg.model.render.occupancy.enabled = variant != "uhalf"
    if variant in ("half", "uhalf"):
        cfg.model.render.num_samples.coarse = 32
        cfg.model.render.num_sample_hierarchy = 2

    Dataset = resolve("dataset", cfg.data.type)
    arrays = {k: jnp.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, logdir="/tmp/mlinerf_bench_occ")

    # Build the grid once from the (geometric-init) SDF, as train() would.
    occ_cfg = cfg.model.render.occupancy
    res = int(occ_cfg.resolution)
    hg = cfg.model.object.sdf.encoding.hashgrid
    rmin, rmax = float(hg.range[0]), float(hg.range[1])
    coords = jnp.asarray(occ_ops.grid_coordinates(res, rmin, rmax))[None]

    @jax.jit
    def occ_update(params, it):
        cond = trainer.make_cond(it)
        sdf = trainer.model.apply({"params": params}, coords, cond,
                                  method=trainer.model.sdf_only)[0, :, 0]
        return occ_ops.occupancy_from_sdf(sdf, res, rmin, rmax,
                                          float(occ_cfg.band_cells))

    t_grid0 = time.time()
    grid = occ_update(trainer.state.params, jnp.asarray(0, jnp.int32))
    occupied = float(jax.device_get(grid.mean()))
    t_grid = time.time() - t_grid0
    arrays["occupancy_grid"] = grid

    iters = int(os.environ.get("BENCH_ITERS", 5))
    step = trainer.build_train_step()
    state = trainer.state
    rng = jax.random.PRNGKey(0)
    state, info = step(state, arrays, rng)
    float(jax.device_get(info["total"]))
    t0 = time.time()
    for _ in range(iters):
        state, info = step(state, arrays, rng)
    total = float(jax.device_get(info["total"]))
    dt = (time.time() - t0) / iters
    rays_per_sec = cfg.model.render.rand_rays / dt
    print(json.dumps({
        "metric": f"train_rays_per_sec_occ_{variant}",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / bench.BASELINE_RAYS_PER_SEC, 3),
        "occupied_frac": round(occupied, 4),
        "grid_update_s": round(t_grid, 2),
        "final_loss": round(total, 4),
    }))


if __name__ == "__main__":
    main()
