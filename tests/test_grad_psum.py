"""runtime.grad_psum — explicit DDP gradient layout (shard_map + pmean).

The default multi-chip layout leaves partitioning to XLA's SPMD pass, which
all-gathers the hash-table scatter OPERANDS (~1.26 GB/step at the bench
shape — PERF.md round 4). ``runtime.grad_psum`` instead computes grads
per-device on the local ray shard and pmean-combines them — the reference's
per-GPU DDP semantics (imaginaire/trainers/utils/get_trainer.py:80-88) with
~5-10x less collective traffic. These tests pin (1) exactness when the step
is rng-free, (2) robustness with stratified jitter, (3) the non-divisible
fallback, and (4) the comm-volume claim itself via HLO accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.config import resolve
from mlinerf_tpu.parallel import mesh as pmesh


def _cfg(tmp_path, max_iter=2, stratified=False):
    from tests.test_train_e2e import tiny_lumen_cfg

    cfg = tiny_lumen_cfg(tmp_path, "a", max_iter=max_iter)
    cfg.model.render.rand_rays = 64  # divisible by 8
    cfg.model.render.stratified = stratified
    cfg.runtime.mesh = "rays"
    return cfg


def _train(cfg, tmp_path, tag):
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=0, logdir=str(tmp_path / tag))
    tr.train(arrays)
    return tr


def test_grad_psum_matches_constraint_layout_rng_free(tmp_path):
    """With stratified jitter off the train step is rng-free, so the DDP
    layout must reproduce the constraint layout exactly (up to reduction
    order): per-shard means of per-ray losses pmean to the global mean."""
    results = {}
    for grad_psum in (False, True):
        cfg = _cfg(tmp_path, max_iter=2, stratified=False)
        cfg.runtime.grad_psum = grad_psum
        tr = _train(cfg, tmp_path, f"gp_{grad_psum}")
        results[grad_psum] = tr.losses_host["render"]
    np.testing.assert_allclose(results[False], results[True], rtol=1e-4)


def test_grad_psum_runs_stratified(tmp_path):
    """With stratified jitter each device folds in its axis index — not
    bitwise vs the global program, but it must train with finite losses."""
    cfg = _cfg(tmp_path, max_iter=3, stratified=True)
    cfg.runtime.grad_psum = True
    tr = _train(cfg, tmp_path, "gp_strat")
    assert np.isfinite(tr.losses_host["render"])


def test_grad_psum_bf16_wire_runs(tmp_path):
    """grad_psum: "bf16" combines grads in bf16 on the wire — must train
    with finite losses and stay close to the fp32 combine."""
    results = {}
    for mode in (True, "bf16"):
        cfg = _cfg(tmp_path, max_iter=2, stratified=False)
        cfg.runtime.grad_psum = mode
        tr = _train(cfg, tmp_path, f"gpb_{mode}")
        results[mode] = tr.losses_host["render"]
    assert np.isfinite(results["bf16"])
    np.testing.assert_allclose(results[True], results["bf16"], rtol=5e-2)


def test_grad_psum_non_divisible_falls_back(tmp_path):
    """63 rays % 8 devices != 0 -> partial_grad_specs returns None and the
    step silently uses the constraint layout."""
    cfg = _cfg(tmp_path, max_iter=2, stratified=False)
    cfg.model.render.rand_rays = 63
    cfg.runtime.grad_psum = True
    tr = _train(cfg, tmp_path, "gp_odd")
    assert np.isfinite(tr.losses_host["render"])


def test_partial_grad_specs_shapes():
    mesh = pmesh.get_mesh("rays")
    batch = {
        "idx": jnp.zeros((2,), jnp.int32),
        "ray_idx": jnp.zeros((2, 64), jnp.int32),
        "image_sampled": jnp.zeros((2, 64, 3)),
        "pose": jnp.zeros((2, 3, 4)),
    }
    specs = pmesh.partial_grad_specs(mesh, batch, ray_axis_keys=("ray_idx",))
    assert specs["ray_idx"] == jax.sharding.PartitionSpec(None, "rays")
    assert specs["image_sampled"] == jax.sharding.PartitionSpec(None, "rays", None)
    assert specs["pose"] == jax.sharding.PartitionSpec()
    # non-divisible ray axis -> full fallback
    batch["ray_idx"] = jnp.zeros((2, 63), jnp.int32)
    assert pmesh.partial_grad_specs(mesh, batch, ("ray_idx",)) is None


def test_grad_psum_auto_policy_on_mesh(tmp_path):
    """Default policy (round-5 verdict item 7): with runtime.grad_psum unset
    ("auto"), any mesh > 1 device gets the DDP layout — the 5.6-11x comm cut
    must not require an opt-in flag (reference counterpart: DDP is the
    unconditional multi-GPU wrapper, get_trainer.py:80-88)."""
    cfg = _cfg(tmp_path, max_iter=1, stratified=False)
    assert cfg.runtime.grad_psum == "auto"  # the config_base.yaml default
    tr = _train(cfg, tmp_path, "gp_auto")
    assert tr.grad_psum is True
    assert np.isfinite(tr.losses_host["render"])


def test_grad_psum_auto_off_single_device(tmp_path):
    """auto resolves to False when there is no mesh (single chip): the
    constraint layout is bitwise-exact there and DDP would be a no-op."""
    cfg = _cfg(tmp_path, max_iter=1, stratified=False)
    cfg.runtime.mesh = "none"
    tr = _train(cfg, tmp_path, "gp_auto1")
    assert tr.grad_psum is False


def test_grad_psum_auto_defers_to_shard_tables(tmp_path):
    """auto + shard_tables: ZeRO wins (its params must stay row-sharded;
    shard_map would re-gather them), no error — the error is reserved for
    an EXPLICIT grad_psum request."""
    cfg = _cfg(tmp_path, max_iter=1, stratified=False)
    cfg.model.object.sdf.encoding.hashgrid.dict_size = 13
    cfg.runtime.shard_tables = True
    tr = _train(cfg, tmp_path, "gp_auto_zt")
    assert tr.grad_psum is False
    assert np.isfinite(tr.losses_host["render"])


def test_grad_psum_conflicts_with_shard_tables(tmp_path):
    """EXPLICIT grad_psum together with shard_tables raises: the shard_map
    in_specs replicate params, so row-sharded tables would be silently
    re-gathered every step, negating both levers (round-4 ADVICE)."""
    cfg = _cfg(tmp_path, max_iter=1, stratified=False)
    cfg.runtime.grad_psum = True
    cfg.runtime.shard_tables = True
    Trainer = resolve("trainer", cfg.trainer.type)
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(cfg, seed=0, logdir=str(tmp_path / "gp_conflict"))


def test_grad_psum_fallback_warns(tmp_path, capsys):
    """When grad_psum is active but the ray count does not divide the mesh,
    the fallback to the constraint layout must be announced (round-4 ADVICE:
    a silent fallback hides a 5.6x comm regression)."""
    cfg = _cfg(tmp_path, max_iter=2, stratified=False)
    cfg.model.render.rand_rays = 63
    cfg.runtime.grad_psum = True
    tr = _train(cfg, tmp_path, "gp_warn")
    assert np.isfinite(tr.losses_host["render"])
    out = capsys.readouterr().out
    assert "[grad_psum] WARNING" in out and "constraint layout" in out


def test_grad_psum_cuts_collective_bytes(tmp_path):
    """The point of the layout: compile the real train step both ways on the
    8-device mesh and require the DDP layout to move well under half the
    constraint layout's collective bytes."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from analyze_multichip import collective_bytes

    totals = {}
    for grad_psum in (False, True):
        cfg = _cfg(tmp_path, max_iter=1, stratified=True)
        cfg.runtime.grad_psum = grad_psum
        Dataset = resolve("dataset", cfg.data.type)
        arrays = {k: jnp.asarray(v) for k, v in Dataset(cfg).as_arrays().items()}
        Trainer = resolve("trainer", cfg.trainer.type)
        tr = Trainer(cfg, seed=0, logdir=str(tmp_path / f"hlo_{grad_psum}"))
        step = tr.build_train_step()
        hlo = step.lower(tr.state, arrays, jax.random.PRNGKey(0)).compile().as_text()
        comm = collective_bytes(hlo)
        totals[grad_psum] = sum(v["bytes"] for v in comm.values())
    assert totals[True] < 0.5 * totals[False], totals
