"""Minimal repro / bisection of the TPU worker fault on scanned scatter programs.

Round-1 observation (PERF.md): `lax.scan` windows of the exact-gradient train
step fault the TPU worker at 8+ steps (parity scale) while the stencil's
smaller program survives 32; all-chunks `lax.map` inference faults at
production size. This script strips the model away: each scanned step is
G gathers + S scatter-adds into L tables of 2^D rows — the structural
skeleton of the train step — and bisects the window size N where the worker
dies. Each (config, N) runs in a CHILD process (a faulted worker poisons the
client).

    python -u scripts/repro_worker_fault.py            # run the bisection
    python -u scripts/repro_worker_fault.py child <D> <L> <S> <N>  # one probe
"""

import json
import os
import subprocess
import sys


def child(dict_log2: int, levels: int, scatters_per_level: int, window: int):
    import jax
    import jax.numpy as jnp

    S = 2**dict_log2
    F = 8
    rows = 2_097_152  # ~2048 rays x 128 samples x 8 corners
    tables = tuple(
        jax.random.normal(jax.random.PRNGKey(lv), (S, F), jnp.bfloat16)
        for lv in range(levels)
    )
    idx = jax.random.randint(jax.random.PRNGKey(99), (scatters_per_level, rows), 0, S)

    def loss(tabs, step):
        total = jnp.zeros((), jnp.float32)
        for lv in range(levels):
            for e in range(scatters_per_level):
                ix = (idx[e] + step) % S
                total += jnp.sum(jnp.take(tabs[lv], ix, axis=0).astype(jnp.float32))
        return total * 1e-6

    def one_step(tabs, step):
        g = jax.grad(loss)(tabs, step)
        return tuple(t - 1e-3 * gt.astype(t.dtype) for t, gt in zip(tabs, g)), 0.0

    @jax.jit
    def run(tabs):
        def body(carry, i):
            tabs = carry
            tabs, _ = one_step(tabs, i)
            return tabs, 0.0
        tabs, _ = jax.lax.scan(body, tabs, jnp.arange(window))
        return tabs

    out = run(tables)
    jax.device_get(jax.tree.leaves(out)[0][:1])
    print("CHILD_OK", flush=True)


def probe(d, l, s, n, timeout=1500):
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "child", str(d), str(l), str(s), str(n)],
        capture_output=True, text=True, timeout=timeout,
    )
    ok = "CHILD_OK" in (r.stdout or "")
    tail = (r.stderr or "").strip().splitlines()[-3:]
    print(json.dumps({"dict": d, "levels": l, "scatters": s, "window": n,
                      "ok": ok, "rc": r.returncode,
                      "err": " | ".join(tail)[-300:] if not ok else ""}), flush=True)
    return ok


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(*(int(x) for x in sys.argv[2:6]))
        return
    # Axis 1: window size at the train-step-like shape (16 levels x 5 evals).
    for n in (2, 5, 8, 12, 16):
        if not probe(22, 16, 5, n):
            break
    # Axis 2: same windows, tables 8x smaller (HBM-footprint hypothesis).
    for n in (8, 16, 32):
        if not probe(19, 16, 5, n):
            break
    # Axis 3: same HBM footprint, fewer ops per step (program-size hypothesis).
    for n in (8, 16, 32):
        if not probe(22, 16, 1, n):
            break
    print("REPRO_DONE", flush=True)


if __name__ == "__main__":
    main()
