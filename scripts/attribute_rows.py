#!/usr/bin/env python
"""Static gather/scatter row attribution for the train step (no chip needed).

Traces ONE train step at the real bench shapes into a jaxpr on CPU (tracing
never executes, so production dict sizes are free) and counts every gather
and scatter-add with the number of rows it touches — recursing into scan /
cond / pjit / remat bodies with the right trip-count multipliers, which a
text-level HLO scrape gets wrong (ops inside `lax.scan` appear once but run
`length` times). The v5e step is row-latency-bound on both ops (PERF.md
"Speed of light"), so these counts ARE the cost model: rows / tier-rate =
seconds. Use it to check the analysis arithmetic and to see where
sampling/PDF evals add gather rows that a config knob (sampling_levels, F4,
corner_sample) is supposed to remove.

Env: the bench.py config knobs (BENCH_CONFIG / BENCH_DICT_SIZE / ...), plus
ATTR_SMALL=1 to shrink the dataset images for quick runs (shapes that matter
— rays, samples, levels, dict — stay at bench scale).

Output: one table per op kind keyed by (operand shape, rows/op), sorted by
total rows, plus totals and a rows -> seconds projection at the measured
v5e tier rates.
"""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

GATHER_PRIMS = {"gather"}
SCATTER_PRIMS = {"scatter", "scatter-add", "scatter-mul", "scatter-min",
                 "scatter-max", "scatter-apply"}
# Measured v5e scatter tier rates (PERF.md "Speed of light"): rows/s by
# operand residency tier.
TIER_RATES = ((119e6, "<=256KB"), (52.5e6, "512KB-8MB"), (12.0e6, ">=16MB"))

# Per-op row rates by TABLE residency tier, for the roofline (all measured
# on this chip — PERF.md round-1 microbenchmarks + round-2 scatter sweep +
# r3d FREEZE subtractions). Scatter: 119 / 52.5 / 12 Mrows/s at <=256KB /
# 512KB-8MB / >=16MB. Gather: 200 Mrows/s at cache-resident sizes, 145 at
# the mid tier, 131 (bf16) / 60 (f32) HBM-resident. Both ops are per-ROW
# latency-bound (width-insensitive), so rows/rate = seconds.
_SCATTER_TIER = ((256 * 1024, 119e6), (8 * 1024 * 1024, 52.5e6),
                 (float("inf"), 12.0e6))
_GATHER_TIER = ((512 * 1024, 200e6), (8 * 1024 * 1024, 145e6),
                (float("inf"), None))  # HBM tier rate depends on dtype


def _row_rate(kind: str, operand_bytes: int, is_bf16: bool) -> float:
    tiers = _SCATTER_TIER if kind == "scatter" else _GATHER_TIER
    for limit, rate in tiers:
        if operand_bytes <= limit:
            if rate is None:  # gather HBM tier
                return 131e6 if is_bf16 else 60e6
            return rate
    raise AssertionError


def _aval_str(aval):
    return f"{list(aval.shape)}:{aval.dtype}"


_DTYPE_BYTES = {"bfloat16": 2, "float16": 2, "float32": 4, "float64": 8,
                "int8": 1, "uint8": 1, "int16": 2, "uint16": 2,
                "int32": 4, "uint32": 4, "int64": 8, "uint64": 8, "bool": 1}


def _parse_aval_bytes(aval_str: str):
    """(nbytes, is_bf16) back out of an _aval_str key."""
    shape_s, dtype_s = aval_str.rsplit(":", 1)
    dims = [int(x) for x in shape_s.strip("[]").split(",") if x.strip()]
    n = 1
    for d in dims:
        n *= d
    return n * _DTYPE_BYTES.get(dtype_s, 4), dtype_s == "bfloat16"


def walk(jaxpr, mult, gathers, scatters, whiles):
    """Accumulate row counts over `jaxpr`, scaled by trip multiplier `mult`."""
    from jax._src.core import ClosedJaxpr

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in GATHER_PRIMS or name in SCATTER_PRIMS:
            operand = eqn.invars[0].aval
            idx = eqn.invars[1].aval
            # jax's lax.gather/scatter put the index vector in the LAST dim
            # of the indices operand.
            rows = 1
            for d in idx.shape[:-1]:
                rows *= int(d)
            table = gathers if name in GATHER_PRIMS else scatters
            key = (_aval_str(operand), rows, name)
            table[key][0] += mult
            table[key][1] += mult * rows
            continue
        if name == "while":
            # Trip count is dynamic; count the body ONCE and flag it.
            whiles[0] += mult
            body = eqn.params.get("body_jaxpr")
            if body is not None:
                walk(body.jaxpr, mult, gathers, scatters, whiles)
            continue
        if name == "scan":
            length = int(eqn.params["length"])
            walk(eqn.params["jaxpr"].jaxpr, mult * length,
                 gathers, scatters, whiles)
            continue
        if name == "cond":
            # Branches are alternatives; count the worst case (max rows).
            best = None
            for br in eqn.params["branches"]:
                g2 = defaultdict(lambda: [0, 0])
                s2 = defaultdict(lambda: [0, 0])
                w2 = [0]
                walk(br.jaxpr, mult, g2, s2, w2)
                tot = sum(v[1] for v in g2.values()) + sum(
                    v[1] for v in s2.values())
                if best is None or tot > best[0]:
                    best = (tot, g2, s2, w2)
            if best is not None:
                for k, v in best[1].items():
                    gathers[k][0] += v[0]
                    gathers[k][1] += v[1]
                for k, v in best[2].items():
                    scatters[k][0] += v[0]
                    scatters[k][1] += v[1]
                whiles[0] += best[3][0]
            continue
        # Generic recursion: any param holding a (Closed)Jaxpr — covers
        # pjit, remat/checkpoint, custom_vjp/jvp call wrappers.
        for p in eqn.params.values():
            if isinstance(p, ClosedJaxpr):
                walk(p.jaxpr, mult, gathers, scatters, whiles)
            elif hasattr(p, "eqns"):  # raw Jaxpr
                walk(p, mult, gathers, scatters, whiles)
            elif isinstance(p, (tuple, list)):
                for q in p:
                    if isinstance(q, ClosedJaxpr):
                        walk(q.jaxpr, mult, gathers, scatters, whiles)
                    elif hasattr(q, "eqns"):
                        walk(q, mult, gathers, scatters, whiles)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import bench
    from mlinerf_tpu.config import resolve

    cfg = bench.build_bench_cfg()
    if os.environ.get("ATTR_SMALL"):
        cfg.data.train.image_size = [64, 64]
        cfg.data.val.image_size = [64, 64]

    Dataset = resolve("dataset", cfg.data.type)
    arrays = {k: np.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, logdir="/tmp/mlinerf_attr")
    step = trainer.build_train_step()
    rng = jax.random.PRNGKey(0)
    closed = jax.make_jaxpr(step)(trainer.state, arrays, rng)

    # Dead-code-eliminate first: dangling cotangent chains (e.g. the csamp
    # weights-cotangent when nothing differentiates through the weights)
    # exist in the raw jaxpr but XLA removes them — counting them would
    # overstate the runtime rows.
    from jax._src.interpreters import partial_eval as pe

    jaxpr, _ = pe.dce_jaxpr(closed.jaxpr, [True] * len(closed.jaxpr.outvars))

    gathers = defaultdict(lambda: [0, 0])   # key -> [count, rows]
    scatters = defaultdict(lambda: [0, 0])
    whiles = [0]
    walk(jaxpr, 1, gathers, scatters, whiles)

    def report(name, table):
        total = 0
        print(f"\n== {name} ==")
        items = sorted(table.items(), key=lambda kv: -kv[1][1])
        for (operand, rows_per, prim), (count, rows) in items:
            total += rows
            print(f"  {count:4d}x {prim:<12s} rows={rows:>13,} "
                  f"({rows_per:,}/op)  operand {operand}")
        print(f"  TOTAL {name} rows: {total:,}")
        return total

    g = report("gather", gathers)
    s = report("scatter", scatters)
    if whiles[0]:
        print(f"\nNOTE: {whiles[0]} while loop(s) counted at ONE trip each "
              "(dynamic trip count).")
    print()
    for rate, tier in TIER_RATES:
        print(f"scatter rows at {tier} tier ({rate/1e6:.0f} Mrows/s): "
              f"{s / rate:.3f} s/step")

    # Roofline: every row priced at its operand's measured tier rate (the
    # ops are per-row latency-bound, so sum(rows/rate) is the floor the
    # hardware+toolchain allows this program; v5e executes the fusions
    # serially, so the terms add).
    floor_s = 0.0
    for table, kind in ((gathers, "gather"), (scatters, "scatter")):
        for (operand, _rows_per, _prim), (_count, rows) in table.items():
            nbytes, is_bf16 = _parse_aval_bytes(operand)
            floor_s += rows / _row_rate(kind, nbytes, is_bf16)
    rays = int(cfg.model.render.rand_rays)
    attainable = rays / floor_s if floor_s > 0 else float("inf")
    print(f"\nroofline: floor {floor_s:.3f} s/step -> attainable "
          f"{attainable:,.0f} rays/s at {rays} rays/step")
    print(f"\n(config: {os.environ.get('BENCH_CONFIG', bench.DEFAULT_CONFIG)}, "
          f"gather rows {g:,}, scatter rows {s:,})")
    if "--json" in sys.argv:
        import json

        print(json.dumps(dict(
            config=os.environ.get("BENCH_CONFIG", bench.DEFAULT_CONFIG),
            gather_rows=int(g), scatter_rows=int(s),
            floor_s_per_step=floor_s,
            attainable_rays_per_sec=attainable,
            rays_per_step=rays,
        )))


if __name__ == "__main__":
    main()
