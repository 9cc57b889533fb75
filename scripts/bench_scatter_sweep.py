"""Single-process sweep of scatter-add strategies vs table size on TPU.

One process = one tunnel setup; each config is compiled and timed in turn
(scatter microbenches don't suffer the train-step HBM pollution that forced
fresh-process measurement elsewhere — buffers are freed between configs).

    python -u scripts/bench_scatter_sweep.py | tee /tmp/scatter_sweep.log
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
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, S, dtype=jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(1), (N, F), dtype=dtype)
    table = jnp.zeros((S, F), dtype)

    if variant == "scatter":
        fn = jax.jit(lambda t, i, v: t.at[i].add(v))
    elif variant == "scatter_drop":
        fn = jax.jit(lambda t, i, v: t.at[i].add(v, mode="drop"))
    elif variant == "sorted":
        def body(t, i, v):
            order = jnp.argsort(i)
            return t.at[i[order]].add(jnp.take(v, order, axis=0),
                                      indices_are_sorted=True, mode="drop")
        fn = jax.jit(body)
    elif variant == "segsum":
        def body(t, i, v):
            order = jnp.argsort(i)
            si = i[order]
            sv = jnp.take(v, order, axis=0)
            first = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
            seg = jnp.cumsum(first) - 1
            summed = jax.ops.segment_sum(sv, seg, num_segments=N)
            uidx = jnp.cumsum(first) - 1
            uniq_full = jnp.full((N,), S, si.dtype).at[uidx].set(
                jnp.where(first, si, S), mode="drop")
            return t.at[uniq_full].add(summed.astype(t.dtype),
                                       indices_are_sorted=True, unique_indices=True,
                                       mode="drop")
        fn = jax.jit(body)
    elif variant == "take_grad":
        def loss(t, i, v):
            return jnp.sum(jnp.take(t, i, axis=0).astype(jnp.float32) * v.astype(jnp.float32))
        fn = jax.jit(jax.grad(loss))
    else:
        raise ValueError(variant)

    try:
        dt = timed(fn, table, idx, vals)
        print(json.dumps({"variant": variant, "size_log2": size_log2,
                          "dtype": dtype.dtype.name if hasattr(dtype, "dtype") else str(dtype),
                          "ms": round(dt * 1e3, 1),
                          "Mrows_per_s": round(2**n_log2 / dt / 1e6, 1)}), flush=True)
    except Exception as exc:
        print(json.dumps({"variant": variant, "size_log2": size_log2,
                          "error": str(exc)[:200]}), flush=True)


if __name__ == "__main__":
    for sz in (13, 14, 15, 16, 17, 18, 19, 20, 22):
        run(sz, jnp.bfloat16, "scatter")
    for sz in (14, 16, 18, 19, 22):
        run(sz, jnp.float32, "scatter")
    for v in ("scatter_drop", "sorted", "segsum", "take_grad"):
        run(22, jnp.bfloat16, v)
    for v in ("scatter_drop", "take_grad"):
        run(17, jnp.bfloat16, v)
    print("SWEEP_DONE", flush=True)
