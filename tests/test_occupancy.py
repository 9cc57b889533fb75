"""Occupancy-grid sampling (opt-in TPU optimization, ops/occupancy.py).

The reference has no occupancy grid (it marches a fixed uniform budget,
projects/neuralangelo/model.py sample_dists_all); this feature is an
opt-in TPU-side extension, so the tests pin both its own math AND that
the default path is untouched.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import Config, resolve
from mlinerf_tpu.ops import occupancy as occ


def sphere_sdf(points, radius=0.45):
    return np.linalg.norm(points, axis=-1) - radius


def test_occupancy_from_sdf_marks_shell():
    R = 32
    coords = occ.grid_coordinates(R, -1.0, 1.0)
    sdf = sphere_sdf(coords)
    grid = np.asarray(occ.occupancy_from_sdf(jnp.asarray(sdf), R, -1.0, 1.0, band_cells=2.0))
    assert grid.shape == (R, R, R)
    cell = 2.0 / R
    dist = np.abs(sdf).reshape(R, R, R)
    # cells inside the band are on; cells far outside are off
    assert grid[dist < 1.9 * cell].all()
    assert not grid[dist > 2.1 * cell].any()
    # the shell is sparse: most of the volume is empty
    assert grid.mean() < 0.2


def test_lookup_nearest_cell():
    R = 16
    grid = jnp.zeros((R, R, R)).at[8, 8, 8].set(1.0)
    # cell (8,8,8) spans [0, 0.125) in each world axis for range [-1, 1]
    inside = jnp.asarray([[0.05, 0.05, 0.05]])
    outside = jnp.asarray([[0.5, 0.5, 0.5]])
    assert float(occ.lookup(grid, inside, -1.0, 1.0)[0]) == 1.0
    assert float(occ.lookup(grid, outside, -1.0, 1.0)[0]) == 0.0
    # out-of-range points clamp instead of wrapping
    far = jnp.asarray([[5.0, 5.0, 5.0]])
    assert float(occ.lookup(grid, far, -1.0, 1.0)[0]) == 0.0


def test_occupancy_coarse_dists_concentrate_near_surface():
    R = 64
    coords = occ.grid_coordinates(R, -1.0, 1.0)
    grid = occ.occupancy_from_sdf(
        jnp.asarray(sphere_sdf(coords)), R, -1.0, 1.0, band_cells=2.0
    )
    # a ray through the sphere center: surface hits at t = 2 - 0.45 and 2 + 0.45
    center = jnp.asarray([[[0.0, 0.0, -2.0]]])
    ray_unit = jnp.asarray([[[0.0, 0.0, 1.0]]])
    near = jnp.full((1, 1, 1), 1.0)
    far = jnp.full((1, 1, 1), 3.0)
    dists = occ.occupancy_coarse_dists(
        grid, center, ray_unit, near, far, 64, -1.0, 1.0,
        march_bins=128, floor=0.01,
    )
    assert dists.shape == (1, 1, 64, 1)
    d = np.asarray(dists)[0, 0, :, 0]
    assert (np.diff(d) >= 0).all()
    assert (d >= 1.0).all() and (d <= 3.0).all()
    # most samples land within the occupied shells around the two crossings
    near_surface = (np.abs(d - 1.55) < 0.15) | (np.abs(d - 2.45) < 0.15)
    assert near_surface.mean() > 0.5
    # a uniform draw would put only ~15% of samples there
    uniform = np.linspace(1.0, 3.0, 64)
    uni_near = (np.abs(uniform - 1.55) < 0.15) | (np.abs(uniform - 2.45) < 0.15)
    assert near_surface.mean() > 2 * uni_near.mean()


def test_occupancy_coarse_dists_empty_grid_falls_back_to_floor():
    """All-empty grid -> flat floor PDF -> roughly uniform samples, no NaNs."""
    grid = jnp.zeros((16, 16, 16))
    center = jnp.zeros((1, 2, 3))
    ray_unit = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])
    near = jnp.full((1, 2, 1), 0.5)
    far = jnp.full((1, 2, 1), 2.5)
    dists = occ.occupancy_coarse_dists(
        grid, center, ray_unit, near, far, 32, -1.0, 1.0, floor=0.02
    )
    d = np.asarray(dists)
    assert np.isfinite(d).all()
    assert (d >= 0.5 - 1e-5).all() and (d <= 2.5 + 1e-5).all()
    # near-uniform coverage of [near, far]
    assert d[0, 0, :, 0].max() - d[0, 0, :, 0].min() > 1.5


def _tiny_occ_cfg(max_iter=6):
    cfg = Config(os.path.join(os.path.dirname(__file__), "..", "configs", "syn_sphere_a.yaml"))
    cfg.max_iter = max_iter
    cfg.logging_iter = max(max_iter // 2, 1)
    cfg.validation_iter = 10**9
    cfg.checkpoint.save_iter = 10**9
    cfg.checkpoint.save_latest_iter = 10**9
    cfg.model.render.rand_rays = 64
    cfg.model.render.num_samples.coarse = 24
    cfg.model.render.num_samples.fine = 8
    cfg.model.render.num_sample_hierarchy = 1
    cfg.model.object.sdf.mlp.hidden_dim = 64
    cfg.model.object.rgb.mlp.hidden_dim = 64
    cfg.model.object.rgb.mlp.num_layers = 2
    cfg.model.object.sdf.encoding.levels = 4
    cfg.model.object.sdf.encoding.hashgrid.min_logres = 3
    cfg.model.object.sdf.encoding.hashgrid.max_logres = 6
    cfg.model.object.sdf.encoding.hashgrid.dict_size = 12
    cfg.model.object.sdf.encoding.hashgrid.dim = 2
    cfg.data.train.image_size = [32, 32]
    cfg.data.val.image_size = [32, 32]
    cfg.data.num_cameras = 4
    cfg.data.num_lights = 2
    cfg.model.render.occupancy.enabled = True
    cfg.model.render.occupancy.resolution = 16
    cfg.model.render.occupancy.update_every = 3
    return cfg


def test_occupancy_gating_preserves_default_sampling(tmp_path):
    """Disabled occupancy (or a missing grid) must leave coarse sampling
    bitwise-identical to the reference-exact uniform path."""
    cfg = _tiny_occ_cfg(max_iter=1)
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "gate"))
    model, params = tr.model, tr.state.params
    key = jax.random.PRNGKey(3)
    center = jnp.zeros((1, 4, 3))
    ray_unit = jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]]), (1, 4, 1))
    near = jnp.full((1, 4, 1), 0.5)
    far = jnp.full((1, 4, 1), 2.5)
    # hashgrid range is [-2,2] -> cell 0.25: occupied only for z in [0.5,1.0)
    # so the ray segment [0.5,2.5] is 3/4 empty and placement must shift.
    grid = jnp.zeros((16, 16, 16)).at[:, :, 10:12].set(1.0)

    def sample(cond):
        return model.apply({"params": params}, center, ray_unit, near, far,
                           cond, False, key, method=model.sample_dists_all)

    base_cond = dict(tr.make_cond(jnp.zeros((), jnp.int32)))
    with_grid = dict(base_cond, occupancy_grid=grid)
    d_occ = sample(with_grid)
    # enabled + grid takes the occupancy branch (different placement)
    assert not np.allclose(np.asarray(d_occ), np.asarray(sample(base_cond)))
    # enabled but NO grid in cond -> uniform fallback
    cfg2 = _tiny_occ_cfg(max_iter=1)
    cfg2.model.render.occupancy.enabled = False
    tr2 = resolve("trainer", cfg2.trainer.type)(cfg2, seed=0, logdir=str(tmp_path / "g2"))
    d_disabled = tr2.model.apply(
        {"params": tr2.state.params}, center, ray_unit, near, far,
        dict(tr2.make_cond(jnp.zeros((), jnp.int32)), occupancy_grid=grid),
        False, key, method=tr2.model.sample_dists_all)
    # disabled + grid present -> identical to enabled-without-grid uniform path
    np.testing.assert_array_equal(np.asarray(sample(base_cond)), np.asarray(d_disabled))


def test_train_with_occupancy_enabled(tmp_path):
    cfg = _tiny_occ_cfg(max_iter=6)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "occ"))
    tr.train(arrays)
    assert np.isfinite(tr.losses_host["render"])
    assert np.isfinite(tr.losses_host["eikonal"])
    # the grid was built and is a plausible SDF shell (geometric init ->
    # near-sphere SDF, so some-but-not-all cells occupied)
    grid = np.asarray(tr._last_occupancy_grid)
    assert grid.shape == (16, 16, 16)
    assert 0.0 < grid.mean() < 1.0
