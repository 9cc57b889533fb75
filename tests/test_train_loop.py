"""The scanned multi-step train loop must march through the exact same state
trajectory as repeated single steps (same RNG discipline, schedules, optimizer
updates)."""

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import resolve
from tests.test_train_e2e import tiny_nerf_cfg


def test_scan_loop_matches_single_steps(tmp_path):
    cfg = tiny_nerf_cfg(tmp_path, max_iter=6)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = {k: jnp.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "a"))
    rng = jax.random.fold_in(tr.rng, 17)

    step = tr.build_train_step()
    state_a = tr.state
    for _ in range(6):
        state_a, info_a = step(state_a, arrays, rng)

    tr2 = Trainer(cfg, seed=0, logdir=str(tmp_path / "b"))
    loop = tr2.build_train_loop(6)
    state_b, info_b = loop(tr2.state, arrays, rng)

    assert int(state_a.iteration) == int(state_b.iteration) == 6
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_train_entry_uses_windows(tmp_path):
    """train() with a cadence hits the same iteration count and logs once per
    window."""
    import json, os

    cfg = tiny_nerf_cfg(tmp_path, max_iter=9)
    cfg.logging_iter = 3
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "w"))
    tr.train(arrays)
    assert tr.current_iteration == 9
    with open(os.path.join(str(tmp_path / "w"), "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert [r["step"] for r in recs] == [3, 6, 9]


def test_auto_dispatch_window(tmp_path, capsys):
    """steps_per_dispatch: 'auto' measures one real step, locks a window from
    the time budget, and still lands exactly on every cadence boundary."""
    import json, os

    cfg = tiny_nerf_cfg(tmp_path, max_iter=12)
    cfg.logging_iter = 4
    cfg.trainer.steps_per_dispatch = "auto"
    # A huge budget must still clamp to the cadence (4) and the 32 cap.
    cfg.trainer.dispatch_time_budget = 1e6
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "auto"))
    tr.train(arrays)
    assert tr.current_iteration == 12
    out = capsys.readouterr().out
    assert "auto steps_per_dispatch" in out
    with open(os.path.join(str(tmp_path / "auto"), "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert [r["step"] for r in recs] == [4, 8, 12]
