"""Measure the Pallas VMEM scatter-accumulate kernel vs XLA scatter on TPU.

    python -u scripts/bench_pallas_scatter.py

Also measures the drop-rate question: XLA scatter where most indices are
OOB-dropped (tests whether backward tap-merging would pay off).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.ops import hashgrid_pallas as hp


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


def report(tag, dt, n):
    print(json.dumps({"bench": tag, "ms": round(dt * 1e3, 1),
                      "Mrows_per_s": round(n / dt / 1e6, 1)}), flush=True)


def main():
    N, F = 2**24, 8
    vals = jax.random.normal(jax.random.PRNGKey(1), (N, F), jnp.float32)
    for slog in (14, 16, 17, 18):
        S = 2**slog
        idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, S, jnp.int32)
        try:
            dt = timed(lambda i, v: hp.scatter_add_rows(i, v, S), idx, vals)
            report(f"pallas_s{slog}", dt, N)
        except Exception as exc:
            print(json.dumps({"bench": f"pallas_s{slog}", "error": str(exc)[:300]}),
                  flush=True)
        xla = jax.jit(lambda t, i, v: t.at[i].add(v, mode="drop"))
        dt = timed(xla, jnp.zeros((S, F), jnp.float32), idx, vals)
        report(f"xla_s{slog}", dt, N)

    # Drop-rate probe: 80% OOB indices into a 2^22 table — if dropped rows
    # are near-free, exact backward tap-merging (zeroing merged tap rows)
    # would cut the big-table scatter ~5x.
    S = 2**22
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, S, jnp.int32)
    keep = jax.random.uniform(jax.random.PRNGKey(2), (N,)) < 0.2
    idx80 = jnp.where(keep, idx, S + 1)
    xla = jax.jit(lambda t, i, v: t.at[i].add(v, mode="drop"))
    zeros = jnp.zeros((S, F), jnp.float32)
    dt = timed(xla, zeros, idx, vals)
    report("xla_s22_alllive", dt, N)
    dt = timed(xla, zeros, idx80, vals)
    report("xla_s22_80pct_dropped", dt, N)
    print("PALLAS_BENCH_DONE", flush=True)


if __name__ == "__main__":
    main()
