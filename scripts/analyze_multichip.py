#!/usr/bin/env python
"""Multi-chip scaling model inputs: per-step collective traffic from the
COMPILED sharded program (round-3 verdict item 3 — replace the "4-8 chips
covers the envelope" assertion with numbers).

No multi-chip hardware exists here, so wall-clock scaling cannot be measured
— what CAN be measured exactly, per mesh size, is the communication the SPMD
partitioner actually inserts: this script lowers+compiles the REAL train
step over an N-device virtual mesh and sums every cross-replica collective's
bytes out of the HLO. Combined with the chip-measured constants (scatter/
gather tier rates, the mesh-on/off constraint-overhead probe, PERF.md), this
yields the rays/s/chip model:

  t(N) = max_rows_terms(rows / N at tier rates) + psum_bytes / BW_ici + c0

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/analyze_multichip.py
Env: AMC_DICT (default 15 for compile speed; 19 = bench shape),
     AMC_SIZES (default "1,2,4,8"), AMC_SHARD_TABLES=1 (ZeRO mode),
     AMC_GRAD_PSUM=1 (explicit DDP shard_map layout, runtime.grad_psum).
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1, "s16": 2,
                "u16": 2}

_COLLECTIVES = ("all-reduce", "reduce-scatter", "all-gather",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_bytes(hlo_text: str):
    """Sum output bytes of every cross-replica collective instruction.

    Instruction lines look like
      %all-reduce.30 = (f32[1,256]{1,0}, f32[256,294]{1,0}, ...) all-reduce(...)
    — the op name re-appears after the (possibly tuple) result shape; shape
    tokens carry {layout} suffixes and /*index=N*/ comments.
    """
    out = {k: {"ops": 0, "bytes": 0} for k in _COLLECTIVES}
    op_re = re.compile(r"\b(" + "|".join(_COLLECTIVES) + r")(?:-start)?(?:\.\d+)?\(")
    shape_re = re.compile(r"\w+\[[\d,]*\]")
    for line in hlo_text.splitlines():
        s = line.strip()
        eq = s.find(" = ")
        if eq < 0:
            continue
        m = op_re.search(s, eq)
        if not m:
            continue
        kind = m.group(1)
        shapes = shape_re.findall(s[eq:m.start()])
        out[kind]["ops"] += 1
        out[kind]["bytes"] += sum(_shape_bytes(p) for p in shapes)
    return {k: v for k, v in out.items() if v["ops"]}


def main():
    import jax

    import bench
    from mlinerf_tpu.config import resolve
    from mlinerf_tpu.parallel import mesh as pmesh

    dict_size = int(os.environ.get("AMC_DICT", 15))
    sizes = [int(x) for x in os.environ.get("AMC_SIZES", "1,2,4,8").split(",")]
    os.environ.setdefault("BENCH_CONFIG", "composed")
    cfg = bench.build_bench_cfg()
    cfg.model.object.sdf.encoding.hashgrid.dict_size = dict_size
    cfg.data.train.image_size = [64, 64]
    cfg.data.val.image_size = [64, 64]
    if os.environ.get("AMC_SHARD_TABLES"):
        cfg.runtime.shard_tables = True
    if os.environ.get("AMC_GRAD_PSUM"):
        cfg.runtime.grad_psum = True

    results = {"dict_size": dict_size, "config": os.environ["BENCH_CONFIG"],
               "shard_tables": bool(os.environ.get("AMC_SHARD_TABLES")),
               "grad_psum": bool(os.environ.get("AMC_GRAD_PSUM")),
               "rand_rays": int(cfg.model.render.rand_rays), "mesh": {}}
    for n in sizes:
        if n > len(jax.devices()):
            print(f"[amc] skip N={n}: only {len(jax.devices())} devices")
            continue
        Dataset = resolve("dataset", cfg.data.type)
        arrays = {k: jax.numpy.asarray(v)
                  for k, v in Dataset(cfg).as_arrays().items()}
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, logdir=f"/tmp/amc_{n}")
        tr.mesh = pmesh.get_mesh("rays", jax.devices()[:n])
        if cfg.runtime.get("shard_tables"):
            tr.state = pmesh.shard_hash_tables(tr.mesh, tr.state)
        step = tr.build_train_step()
        rng = jax.random.PRNGKey(0)
        hlo = step.lower(tr.state, arrays, rng).compile().as_text()
        comm = collective_bytes(hlo)
        results["mesh"][n] = comm
        total = sum(v["bytes"] for v in comm.values())
        print(f"[amc] N={n}: {total/1e6:.1f} MB/step in collectives "
              f"({ {k: v['ops'] for k, v in comm.items()} })")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
