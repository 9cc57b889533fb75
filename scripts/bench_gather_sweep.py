"""Single-process sweep of row-GATHER rate vs table size on TPU.

Completes the speed-of-light tier model (PERF.md): the train step's
remainder term is dominated by forward table gathers (static row counts:
scripts/attribute_rows.py), so the per-tier gather rate converts those
counts to seconds exactly like the measured scatter tiers do for the
backward. Variants:

  * ``take``       — plain row gather ``jnp.take(table, idx, axis=0)``
                     (what ops/hashgrid.encode does per level).
  * ``take_16``    — 16 sequential per-level takes from 16 DISTINCT tables
                     (the real step's layout: residency is per-level).
  * ``take_sorted``— gather with pre-sorted indices (locality upper bound:
                     how much of the latency is random-access vs row count).

    python -u scripts/bench_gather_sweep.py | tee /tmp/gather_sweep.log
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, repeats=3):
    out = fn(*args)
    jax.device_get(np.asarray(jax.tree.leaves(out)[0][:1]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(np.asarray(jax.tree.leaves(out)[0][:1]))
        best = min(best, time.time() - t0)
    return best


def run(size_log2, dtype, variant, n_log2=24):
    S, N, F = 2**size_log2, 2**n_log2, 8
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, S, dtype=jnp.int32)
    table = jax.random.normal(jax.random.PRNGKey(1), (S, F), dtype=dtype)

    if variant == "take":
        fn = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), axis=0))
        args = (table, idx)
        rows = N
    elif variant in ("take_wide", "scatter_wide"):
        # Blocked-corner-storage shapes (PERF.md roadmap): 8F=64-lane
        # (128-byte) rows, tables 4-52 MB, ~131K rows/op in the real step.
        # Rates here decide whether dense-level blockification wins.
        F = 64
        table = jax.random.normal(jax.random.PRNGKey(1), (S, F), dtype)
        N = 2**21
        idx = jax.random.randint(key, (N,), 0, S, dtype=jnp.int32)
        if variant == "take_wide":
            fn = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), axis=0))
            args = (table, idx)
        else:
            vals = jax.random.normal(jax.random.PRNGKey(2), (N, F), dtype)
            fn = jax.jit(lambda t, i, v: t.at[i].add(v))
            args = (table, idx, vals)
        rows = N
    elif variant == "take_sorted":
        idx = jnp.sort(idx)
        fn = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0), axis=0))
        args = (table, idx)
        rows = N
    elif variant == "take_16":
        # 16 distinct tables, one take each of N/16 rows — mirrors the
        # per-level loop in ops/hashgrid.encode at equal total rows.
        tables = [jax.random.normal(jax.random.PRNGKey(2 + l), (S, F), dtype)
                  for l in range(16)]
        idx16 = jax.random.randint(key, (16, N // 16), 0, S, dtype=jnp.int32)

        def body(ts, i16):
            acc = jnp.zeros((F,), jnp.float32)
            for l in range(16):
                acc = acc + jnp.sum(
                    jnp.take(ts[l], i16[l], axis=0).astype(jnp.float32), axis=0)
            return acc

        fn = jax.jit(body)
        args = (tables, idx16)
        rows = N
    else:
        raise ValueError(variant)

    try:
        dt = timed(fn, *args)
        print(json.dumps({
            "variant": variant, "size_log2": size_log2,
            "dtype": dtype.dtype.name if hasattr(dtype, "dtype") else str(dtype),
            "ms": round(dt * 1e3, 1),
            "Mrows_per_s": round(rows / dt / 1e6, 1)}), flush=True)
    except Exception as exc:
        print(json.dumps({"variant": variant, "size_log2": size_log2,
                          "error": str(exc)[:200]}), flush=True)


if __name__ == "__main__":
    for sz in (13, 15, 17, 18, 19, 20, 22):
        run(sz, jnp.bfloat16, "take")
    for sz in (17, 19, 22):
        run(sz, jnp.bfloat16, "take_sorted")
    for sz in (17, 19):
        run(sz, jnp.bfloat16, "take_16")
    # Wide-row (64-lane) rates at blocked-corner table sizes: 2^15=4MB ...
    # 2^18=33MB.
    for sz in (15, 16, 17, 18):
        run(sz, jnp.bfloat16, "take_wide")
    for sz in (15, 16, 17, 18):
        run(sz, jnp.bfloat16, "scatter_wide")
    print("SWEEP_DONE", flush=True)
