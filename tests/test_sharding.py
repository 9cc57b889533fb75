"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.parallel import mesh as pmesh


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_and_shard_constraint():
    mesh = pmesh.get_mesh("rays")
    assert mesh is not None and mesh.devices.size == 8

    @jax.jit
    def f(x):
        x = pmesh.shard_rays(mesh, x, axis=1)
        return (x * 2).sum(axis=1)

    x = jnp.ones((2, 64, 3))
    out = f(x)
    np.testing.assert_allclose(out, 128.0)


def test_shard_rays_non_divisible_is_noop():
    mesh = pmesh.get_mesh("rays")
    x = jnp.ones((2, 63, 3))  # 63 % 8 != 0 -> stays replicated, still works
    out = jax.jit(lambda y: pmesh.shard_rays(mesh, y).sum())(x)
    assert np.isfinite(float(out))


def test_sharded_train_step_runs(tmp_path):
    """End-to-end: lumen train step with the ray axis sharded over 8 devices
    must run and produce finite, learning losses."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=4)
    cfg.model.render.rand_rays = 64  # divisible by 8
    cfg.runtime.mesh = "rays"
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "sharded"))
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    tr.train(arrays)
    assert np.isfinite(tr.losses_host["render"])


def test_sharded_matches_unsharded(tmp_path):
    """The sharded step must compute the same numbers as the replicated one
    (same seed, same data)."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    results = {}
    for mesh_mode in ("none", "rays"):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=2)
        cfg.model.render.rand_rays = 64
        cfg.runtime.mesh = mesh_mode
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"m_{mesh_mode}"))
        tr.train(arrays)
        results[mesh_mode] = tr.losses_host["render"]
    np.testing.assert_allclose(results["none"], results["rays"], rtol=1e-4)
