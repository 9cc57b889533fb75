"""Observability parity: TensorBoard scalar/image writer and wandb run-id
persistence for resume (reference imaginaire/trainers/base.py:231-272,
imaginaire/trainers/utils/meters.py:56-147)."""

import glob
import os
import sys
import types

import numpy as np
import pytest

from mlinerf_tpu.trainers.base import MetricsLogger


def test_tensorboard_events_written(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    logdir = str(tmp_path / "tb")
    logger = MetricsLogger(logdir, use_tensorboard=True)
    assert logger.tb is not None
    logger.log_scalars({"train/loss": 1.25}, step=3)
    logger.log_images({"val/rgb": np.zeros((8, 8, 3), np.float32)}, step=3)
    events = glob.glob(os.path.join(logdir, "tensorboard", "events.out.tfevents.*"))
    assert events, "no TB event files written"


def test_wandb_run_id_persists_across_resume(tmp_path, monkeypatch):
    """A resumed run must re-init wandb with the SAME id (wandb_id.txt)."""
    calls = []

    fake = types.ModuleType("wandb")
    fake.util = types.SimpleNamespace(generate_id=lambda: "abc123xy")
    fake.init = lambda **kw: calls.append(kw)
    fake.log = lambda *a, **k: None
    monkeypatch.setitem(sys.modules, "wandb", fake)

    logdir = str(tmp_path / "run")
    MetricsLogger(logdir, use_wandb=True)
    with open(os.path.join(logdir, "wandb_id.txt")) as f:
        assert f.read().strip() == "abc123xy"
    assert calls[-1]["id"] == "abc123xy" and calls[-1]["resume"] == "allow"

    # second construction (resume) reuses the stored id, not a fresh one
    fake.util = types.SimpleNamespace(generate_id=lambda: "DIFFERENT")
    MetricsLogger(logdir, use_wandb=True)
    assert calls[-1]["id"] == "abc123xy"
