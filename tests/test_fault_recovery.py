"""Worker-fault auto-recovery (trainers/base.py train loop).

The v5e worker crashes under sustained scatter pressure (PERF.md
"worker-fault bisection"); a crash mid-window loses the donated state. The
trainer converts that from a run-killing cliff into a resume: reload
``latest_checkpoint.txt``, re-upload the data from the host snapshot, halve
``steps_per_dispatch``, continue. These tests inject the fault at the
dispatch boundary (the exact surface a real XlaRuntimeError crosses).
"""

import os

import numpy as np
import pytest

from mlinerf_tpu.config import resolve
from tests.test_train_e2e import tiny_lumen_cfg


def _make_flaky(builder, calls, fail_on):
    """Wrap a train-step/loop builder so the Nth dispatch raises the
    worker-crash RuntimeError the TPU runtime produces."""

    def build(*a, **k):
        fn = builder(*a, **k)

        def wrapped(state, arrays, rng):
            calls["n"] += 1
            if calls["n"] in fail_on:
                raise RuntimeError(
                    "injected worker fault: TPU worker process crashed or "
                    "restarted mid-window")
            return fn(state, arrays, rng)

        return wrapped

    return build


def test_fault_recovery_resumes_training(tmp_path, capsys):
    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=6)
    cfg.checkpoint.save_latest_iter = 2  # recovery source every 2 iters
    logdir = str(tmp_path / "fr")
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=logdir)

    calls = {"n": 0}
    # Fail on dispatch 3: the save_latest_iter=2 checkpoint exists by then
    # (cadence gcd makes windows 1 step here), so recovery has a source.
    tr.build_train_loop = _make_flaky(tr.build_train_loop, calls, fail_on={3})
    tr.build_train_step = _make_flaky(tr.build_train_step, calls, fail_on={3})
    info = tr.train(arrays)

    out = capsys.readouterr().out
    assert "worker fault caught" in out
    assert "resumed from iteration" in out
    assert tr.current_iteration == 6
    assert np.isfinite(float(np.asarray(info["total"])))
    # The recovery halved the dispatch window (logged).
    assert "steps_per_dispatch halved" in out


def test_fault_without_checkpoint_reraises(tmp_path):
    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=6)
    # No checkpoint cadence -> nothing to recover from -> re-raise.
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "fr2"))
    calls = {"n": 0}
    tr.build_train_loop = _make_flaky(tr.build_train_loop, calls, fail_on={1})
    tr.build_train_step = _make_flaky(tr.build_train_step, calls, fail_on={1})
    with pytest.raises(RuntimeError, match="injected worker fault"):
        tr.train(arrays)


def test_non_fault_errors_pass_through(tmp_path):
    """Host-side errors (bugs, NaN kill-switch) must not be eaten."""
    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=4)
    cfg.checkpoint.save_latest_iter = 2
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "fr3"))

    def boom(*a, **k):
        raise ValueError("some host-side bug")

    tr.build_train_loop = boom
    tr.build_train_step = boom
    with pytest.raises(ValueError, match="host-side bug"):
        tr.train(arrays)


def test_fault_classifier():
    from mlinerf_tpu.trainers.base import _is_worker_fault

    assert _is_worker_fault(RuntimeError("TPU worker process crashed or restarted"))
    assert _is_worker_fault(RuntimeError("FAILED_PRECONDITION: device halted"))
    assert not _is_worker_fault(ValueError("TPU worker process crashed"))  # wrong type
    assert not _is_worker_fault(RuntimeError("shape mismatch in dot_general"))
    assert not _is_worker_fault(FloatingPointError("loss is nan"))
