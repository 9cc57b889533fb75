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
        # Pin the CONSTRAINT layout: this test asserts its bitwise-class
        # equality with the unsharded program. grad_psum (the mesh>1
        # default since round 5) folds per-device rng and is parity-tested
        # separately in tests/test_grad_psum.py.
        cfg.runtime.grad_psum = False
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"m_{mesh_mode}"))
        tr.train(arrays)
        results[mesh_mode] = tr.losses_host["render"]
    np.testing.assert_allclose(results["none"], results["rays"], rtol=1e-4)


def test_zero_sharded_tables_match_replicated(tmp_path):
    """runtime.shard_tables (ZeRO-style hash-table row sharding) must keep
    table leaves row-sharded through trained steps AND match the replicated
    run numerically."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    params_by_mode = {}
    for shard_tables in (False, True):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=3)
        cfg.model.render.rand_rays = 64
        # dict_size 12 -> 4096 rows; lower min_rows via a big enough table:
        cfg.model.object.sdf.encoding.hashgrid.dict_size = 13
        cfg.runtime.mesh = "rays"
        cfg.runtime.shard_tables = shard_tables
        # Both arms on the constraint layout: the False arm would otherwise
        # auto-enable grad_psum (mesh>1 default) and fold per-device rng,
        # breaking the replicated-vs-ZeRO comparison this test is about.
        cfg.runtime.grad_psum = False
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"zt_{shard_tables}"))
        tr.train(arrays)
        params_by_mode[shard_tables] = tr.state.params
        if shard_tables:
            # The hash-table leaves must still be row-sharded after training.
            sharded_leaves = 0
            for path, leaf in jax.tree_util.tree_flatten_with_path(tr.state.params)[0]:
                path_str = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                                    for k in path)
                if "hash_table" in path_str and leaf.ndim == 2 \
                        and leaf.shape[0] % 8 == 0 and leaf.shape[0] >= 8192:
                    spec = leaf.sharding.spec
                    assert spec and spec[0] == "rays", (path_str, spec)
                    sharded_leaves += 1
            assert sharded_leaves > 0

    a = jax.tree.leaves(params_by_mode[False])
    b = jax.tree.leaves(params_by_mode[True])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float32), np.asarray(y, np.float32),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.slow
@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="production-shape test; set RUN_SLOW=1")
def test_zero_sharded_tables_production_shapes(tmp_path):
    """Sharded-vs-replicated equivalence at PRODUCTION table shapes:
    dict_size 2^22 (bf16) across all 16 levels, including odd-resolution
    dense levels that fail the divisibility check and must stay replicated
    (round-1 verdict item 8). dim=4 keeps host memory bounded; the row
    counts (the thing the divisibility/min_rows edges care about) are the
    production ones."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    params_by_mode = {}
    for shard_tables in (False, True):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=1)
        cfg.model.render.rand_rays = 64
        cfg.model.render.num_samples.coarse = 16
        cfg.model.render.num_samples.fine = 4
        enc = cfg.model.object.sdf.encoding
        enc.levels = 16
        enc.hashgrid.dict_size = 22
        enc.hashgrid.min_logres = 5
        enc.hashgrid.max_logres = 11
        enc.hashgrid.dim = 4
        enc.hashgrid.dtype = "bfloat16"  # production table dtype
        cfg.runtime.mesh = "rays"
        cfg.runtime.shard_tables = shard_tables
        cfg.runtime.grad_psum = False  # constraint-layout comparison
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"prod_{shard_tables}"))
        tr.train(arrays)
        params_by_mode[shard_tables] = jax.device_get(tr.state.params)
        if shard_tables:
            sharded, replicated_tables = 0, 0
            for path, leaf in jax.tree_util.tree_flatten_with_path(tr.state.params)[0]:
                path_str = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                                    for k in path)
                if "hash_table" not in path_str or leaf.ndim != 2:
                    continue
                spec = leaf.sharding.spec
                if leaf.shape[0] % 8 == 0 and leaf.shape[0] >= 8192:
                    assert spec and spec[0] == "rays", (path_str, leaf.shape, spec)
                    sharded += 1
                else:
                    # odd dense resolutions (res^3 % 8 != 0) stay replicated
                    assert not spec or spec[0] is None, (path_str, leaf.shape, spec)
                    replicated_tables += 1
            assert sharded > 0 and replicated_tables > 0, (sharded, replicated_tables)

    for x, y in zip(jax.tree.leaves(params_by_mode[False]),
                    jax.tree.leaves(params_by_mode[True])):
        np.testing.assert_allclose(np.asarray(x, np.float32), np.asarray(y, np.float32),
                                   rtol=2e-3, atol=1e-5)


def test_subsampled_gradients_sharded_matches_unsharded(tmp_path):
    """The importance-subsampled gradient path (gradient.subsample) under ray
    sharding must compute the same numbers as the replicated run — top_k and
    put_along_axis act per-ray, so the sharded selection must be identical."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    results = {}
    for mesh_mode in ("none", "rays"):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=2)
        cfg.model.render.rand_rays = 64
        cfg.runtime.mesh = mesh_mode
        cfg.runtime.grad_psum = False  # constraint-layout parity test
        sub = cfg.model.object.sdf.gradient.subsample
        sub.enabled = True
        sub.topk = 6
        sub.stride = 4
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"sub_{mesh_mode}"))
        tr.train(arrays)
        results[mesh_mode] = (tr.losses_host["render"], tr.losses_host["curvature"])
    np.testing.assert_allclose(results["none"], results["rays"], rtol=1e-4)


def test_corner_sampled_sharded_matches_unsharded(tmp_path):
    """The corner-sampled backward (gradient.corner_sample) under ray sharding:
    XLA SPMD keeps global shapes, so the per-point corner draws (and therefore
    the sampled table gradients) are identical to the replicated run."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    results = {}
    for mesh_mode in ("none", "rays"):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=3)
        cfg.model.render.rand_rays = 64
        cfg.runtime.mesh = mesh_mode
        cfg.runtime.grad_psum = False  # constraint-layout parity test
        cfg.model.object.sdf.gradient.corner_sample.enabled = True
        cfg.model.object.sdf.gradient.shared_levels = "auto"
        cfg.model.object.sdf.gradient.hessian.mode = "exact"
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"cs_{mesh_mode}"))
        tr.train(arrays)
        results[mesh_mode] = tr.losses_host["render"]
    np.testing.assert_allclose(results["none"], results["rays"], rtol=1e-4)


def test_dense_blocked_sharded_matches_unsharded(tmp_path):
    """Blocked-corner dense-level storage (encoding.hashgrid.dense_blocked)
    under ray sharding: the blocked table is a pure function of the
    (replicated) level table, so the sharded run must reproduce the
    replicated losses."""
    from tests.test_train_e2e import tiny_lumen_cfg
    from mlinerf_tpu.config import resolve

    results = {}
    for mesh_mode in ("none", "rays"):
        cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=3)
        cfg.model.render.rand_rays = 64
        cfg.runtime.mesh = mesh_mode
        cfg.runtime.grad_psum = False  # constraint-layout parity test
        cfg.model.object.sdf.encoding.hashgrid.dense_blocked = True
        Dataset = resolve("dataset", cfg.data.type)
        arrays = Dataset(cfg).as_arrays()
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"db_{mesh_mode}"))
        tr.train(arrays)
        results[mesh_mode] = tr.losses_host["render"]
    np.testing.assert_allclose(results["none"], results["rays"], rtol=1e-4)
