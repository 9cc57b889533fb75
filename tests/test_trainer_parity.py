"""Trainer-parity regressions from the round-1 verdict:

  * ``grad_accum_iter`` must be REAL gradient accumulation — k steps
    contribute their mean gradient to ONE optimizer update (reference
    imaginaire/trainers/base.py), not a k-times-smaller per-step LR;
  * ``checkpoint.save_epoch`` must actually fire epoch-cadence saves
    (reference imaginaire/trainers/base.py:366-368);
  * ``render_image_light`` must route through the shared windowed renderer
    so the pseudo-label pass gets the validated dispatch recipes.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.config import AttrDict, resolve
from mlinerf_tpu.trainers import optim as optim_lib
from tests.test_train_e2e import tiny_lumen_cfg, tiny_nerf_cfg


def _optim_cfg():
    return AttrDict(
        {"type": "adam", "params": {"lr": 1e-2, "betas": [0.9, 0.99], "eps": 1e-8},
         "sched": {"type": "constant"}}
    )


def test_multisteps_equals_big_batch_update():
    """k accumulated microsteps == one update with the mean gradient."""
    params = {"w": jnp.arange(4.0)}
    g1 = {"w": jnp.asarray([1.0, -2.0, 0.5, 3.0])}
    g2 = {"w": jnp.asarray([0.0, 4.0, -1.5, 1.0])}

    tx_acc, _ = optim_lib.make_optimizer(_optim_cfg(), max_iter=100, grad_accum=2)
    st = tx_acc.init(params)
    u1, st = tx_acc.update(g1, st, params)
    # Microstep 1: no update applied yet.
    assert all(np.all(np.asarray(v) == 0) for v in jax.tree.leaves(u1))
    u2, st = tx_acc.update(g2, st, params)

    tx_ref, _ = optim_lib.make_optimizer(_optim_cfg(), max_iter=100, grad_accum=1)
    st_ref = tx_ref.init(params)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    u_ref, _ = tx_ref.update(g_mean, st_ref, params)

    np.testing.assert_allclose(np.asarray(u2["w"]), np.asarray(u_ref["w"]), rtol=1e-6)


def test_lr_scales_scale_only_matching_groups():
    """optim.lr_scales multiplies updates for params whose path matches the
    keyword, leaving other groups untouched (param-group LR capability;
    csamp's Adam second-moment compensation rides this)."""
    cfg = _optim_cfg()
    cfg.lr_scales = {"hash_table": 2.0}
    params = {"hash_table": jnp.arange(4.0), "mlp": jnp.arange(4.0)}
    grads = {"hash_table": jnp.asarray([1.0, -2.0, 0.5, 3.0]),
             "mlp": jnp.asarray([1.0, -2.0, 0.5, 3.0])}

    tx, _ = optim_lib.make_optimizer(cfg, max_iter=100)
    st = tx.init(params)
    u, _ = tx.update(grads, st, params)

    tx0, _ = optim_lib.make_optimizer(_optim_cfg(), max_iter=100)
    u0, _ = tx0.update(grads, tx0.init(params), params)

    np.testing.assert_allclose(np.asarray(u["hash_table"]),
                               2.0 * np.asarray(u0["hash_table"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u["mlp"]), np.asarray(u0["mlp"]),
                               rtol=1e-6)


def test_grad_accum_defers_param_updates(tmp_path):
    """With grad_accum_iter=2, params only move every second train step."""
    cfg = tiny_nerf_cfg(tmp_path, max_iter=4)
    cfg.trainer.grad_accum_iter = 2
    Dataset = resolve("dataset", cfg.data.type)
    arrays = {k: jnp.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=str(tmp_path / "acc"))
    step = tr.build_train_step()
    rng = jax.random.fold_in(tr.rng, 17)

    p0 = jax.device_get(tr.state.params)
    state, _ = step(tr.state, arrays, rng)
    p1 = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state, _ = step(state, arrays, rng)
    p2 = jax.device_get(state.params)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p2))
    )


def test_save_epoch_checkpoints_fire(tmp_path):
    cfg = tiny_nerf_cfg(tmp_path, max_iter=12)
    cfg.logging_iter = 3
    cfg.data.num_cameras = 2  # epoch advances every 2 iterations (batch 1)
    cfg.data.train.batch_size = 1
    cfg.checkpoint.save_epoch = 1
    logdir = str(tmp_path / "ep")
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, logdir=logdir)
    tr.train(arrays)
    tr.checkpointer.wait()
    saved = glob.glob(os.path.join(logdir, "epoch_*_iteration_*_checkpoint.pkl"))
    assert len(saved) >= 2, saved


def test_render_image_light_dispatch_strategies_agree(tmp_path):
    """Fused, windowed, and per-chunk dispatches of the pseudo-label
    renderer produce the same maps (shared engine, VERDICT item 4)."""
    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=1)
    Dataset = resolve("dataset", cfg.data.type)
    ds = Dataset(cfg, is_inference=True)
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, is_inference=True, logdir=str(tmp_path / "rl"))
    sample = ds.get_full_sample(0)
    data = {k: np.asarray(v)[None] for k, v in sample.items() if not np.isscalar(v)}
    size = cfg.data.val.image_size

    cfg.runtime = cfg.get("runtime", AttrDict()) or AttrDict()
    outs = {}
    for name, (fused, wc) in {
        "fused": (True, 1), "chunked": (False, 1), "windowed": (False, 2),
    }.items():
        cfg.runtime.fused_inference = fused
        cfg.runtime.inference_chunks_per_dispatch = wc
        outs[name] = tr.render_image_light(data, size, num_rays_chunk=256)

    for name in ("chunked", "windowed"):
        for key in outs["fused"]:
            np.testing.assert_allclose(
                np.asarray(outs["fused"][key]), np.asarray(outs[name][key]),
                rtol=1e-5, atol=1e-5, err_msg=f"{name}/{key}",
            )
    assert "visibility" in outs["fused"] and "normal_x_light" in outs["fused"]


def test_curvature_loss_masks_per_ray_outside(tmp_path):
    """The curvature loss must mask outside rays via the per-ray broadcastable
    ``outside`` flag ([B,R,1] against [B,R,N,3] hessians). Regression test: a
    shape-equality guard once dropped the mask, letting the outside rays'
    sentinel-SDF hessians (~1/eps^2) explode the loss."""
    import jax.numpy as jnp

    from mlinerf_tpu.config import resolve
    from tests.test_train_e2e import tiny_lumen_cfg

    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=2)
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / "m"))

    B, R, N = 1, 8, 16
    outside = jnp.zeros((B, R, 1), bool).at[:, ::2].set(True)
    hess = jnp.where(outside[..., None], 1e9, 0.01) * jnp.ones((B, R, N, 3))
    output = {
        "rgb": jnp.zeros((B, R, 3)),
        "gradients": jnp.ones((B, R, N, 3)),
        "hessians": hess,
        "outside": outside,
    }
    batch = {"image_sampled": jnp.zeros((B, R, 3))}
    losses, _ = tr.compute_loss(output, batch, "train")
    # Masked mean over (lap * inside): only inside rays' 0.03 survives.
    assert float(losses["curvature"]) < 1.0, float(losses["curvature"])

    # Strided-subset hessians (model pre-masked) must not crash either.
    output["hessians"] = jnp.full((B, R, N // 4, 3), 0.01)
    losses2, _ = tr.compute_loss(output, batch, "train")
    assert float(losses2["curvature"]) < 1.0
