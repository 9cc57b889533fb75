#!/usr/bin/env python
"""Small-scale quality A/B harness on the procedural synthetic scene.

Trains the stage-a Lumen model for a few hundred iterations per variant and
prints the validation PSNR, isolating the quality effect of one config knob
at a time (the occupancy and shared-tap studies in docs/round1_evidence used
this workload).

Platform: runs on the AMBIENT JAX platform (``JAX_PLATFORMS`` is only
``setdefault``-ed, so the axon TPU tunnel wins when registered — measured
~3x faster per 2000-iter cell than the single CPU here). Control and
candidate cells must share a platform (fp reduction order shifts absolute
PSNR slightly); force CPU with ``env -u PALLAS_AXON_POOL_IPS
JAX_PLATFORMS=cpu``. Variants are chosen with AB_STUDY:

  shared  — gradient.shared_levels 0 / half / all (the stencil fast path)
  occ     — occupancy off/on at shrinking coarse budgets

Env: AB_ITERS (default 300), AB_STUDY (default shared), AB_SEED (default 0),
AB_SCENE (sphere | cluttered — the multi-object hard-shadow stress scene).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def base_cfg(tmp, iters, base=None):
    from mlinerf_tpu.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # AB_BASE_CONFIG swaps the whole cell substrate: the default is the toy
    # 64x64 mirror (syn_sphere_a); AB_STUDY=prodscale uses
    # syn_prodscale_a.yaml (production model shape, 256x256 cluttered scene)
    # and keeps that config's own sizes.
    base = base or os.environ.get("AB_BASE_CONFIG", "syn_sphere_a.yaml")
    cfg = Config(os.path.join(here, "configs", base))
    cfg.max_iter = iters
    cfg.logging_iter = min(iters, 500)
    cfg.validation_iter = 10**9
    cfg.checkpoint.save_iter = 10**9
    cfg.checkpoint.save_latest_iter = 10**9
    if base.startswith("syn_sphere_"):  # _a and the stage-b twin alike
        cfg.model.render.rand_rays = 256
        cfg.model.render.rand_rays_val = 2048
        cfg.data.train.image_size = [64, 64]
        cfg.data.val.image_size = [64, 64]
        cfg.data.num_cameras = 6
        cfg.data.num_lights = 2
        # AB_SCENE=cluttered swaps the single sphere for the multi-object
        # hard-shadow scene (data/synthetic.py CLUTTERED_SPHERES) — the
        # capacity-cut stress gate. Default stays the sphere so existing
        # cells remain comparable.
        cfg.data.scene = os.environ.get("AB_SCENE", "sphere")
    elif "AB_SCENE" in os.environ:
        cfg.data.scene = os.environ["AB_SCENE"]
    # AB_IMAGE_SIZE=512: square image-size override (e.g. the 512x512
    # prodscale arm — the reference's synthetic resolution,
    # syn_hotdog_a.yaml:15-17).
    if "AB_IMAGE_SIZE" in os.environ:
        hw = int(os.environ["AB_IMAGE_SIZE"])
        cfg.data.train.image_size = [hw, hw]
        cfg.data.val.image_size = [hw, hw]
    return cfg


def run_variant(name, mutate, iters):
    import numpy as np

    from mlinerf_tpu.config import resolve

    tmp = f"/tmp/quality_ab/{name.replace(' ', '_')}"
    os.makedirs(tmp, exist_ok=True)
    cfg = base_cfg(tmp, iters)
    mutate(cfg)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=int(os.environ.get("AB_SEED", 0)), logdir=tmp)
    print(f"=== {name} ===", flush=True)
    tr.train(arrays)
    val_ds = Dataset(cfg, is_inference=True)
    psnr = tr.validate(val_ds, cfg.max_iter, max_samples=3)
    jax.clear_caches()
    return psnr


def run_stageb_variant(name, mutate, iters):
    """Self-contained two-stage arm: stage-a train -> per-(cam,light) light
    renders -> pseudo-label pipeline -> stage-b train (warm start, partial
    training, intrinsic losses) -> RGB + Reflectance/Shading component PSNR
    against the procedural scene's analytic GT (data.val.load_iid).

    Composes with any study via AB_STAGEB=1: the study's mutator shapes BOTH
    stages (the encoder must match for the warm start), so a cell prices a
    knob's effect on the INTRINSIC decomposition, pseudo-label noise
    included — the reference scores Ref/Sha too (compute_metrics.py:38-112).
    AB_ITERS_B overrides the stage-b length (default: iters // 2).
    """
    import numpy as np

    from mlinerf_tpu.config import resolve

    tmp = f"/tmp/quality_ab_b/{name.replace(' ', '_').replace(':', '')}"
    a_dir = os.path.join(tmp, "a")
    os.makedirs(a_dir, exist_ok=True)
    seed = int(os.environ.get("AB_SEED", 0))

    # ---- stage a
    cfg = base_cfg(a_dir, iters)
    mutate(cfg)
    Dataset = resolve("dataset", cfg.data.type)
    arrays = Dataset(cfg).as_arrays()
    Trainer = resolve("trainer", cfg.trainer.type)
    tr = Trainer(cfg, seed=seed, logdir=a_dir)
    print(f"=== {name} [stage a] ===", flush=True)
    tr.train(arrays)
    tr.save_checkpoint()
    tr.checkpointer.wait()

    # ---- pseudo labels (the production route: rendered visibility/shading
    # proxies cross-referenced over lights)
    from mlinerf_tpu.pipelines.pseudo_label import generate_pseudo_labels

    ds_full = Dataset(cfg)
    if hasattr(ds_full, "sample_train_rays"):
        ds_full.sample_train_rays = False
    lights_dir = os.path.join(a_dir, "lights")
    results = tr.test_all_light(ds_full, lights_dir, mode="train",
                                dataset_type="unpair", sample_num=4,
                                seed=999, save_pngs=False)
    labels_dir = os.path.join(a_dir, "labels")
    os.makedirs(labels_dir, exist_ok=True)
    generate_pseudo_labels(results, "unpair", labels_dir)
    label_path = os.path.join(labels_dir, "pseudo_label_all.npz")
    print(f"[stage b] pseudo labels at {label_path}", flush=True)

    # ---- stage b
    iters_b = int(os.environ.get("AB_ITERS_B", max(iters // 2, 1)))
    base_b = os.environ.get("AB_BASE_CONFIG", "syn_sphere_a.yaml").replace(
        "_a.yaml", "_b.yaml")
    b_dir = os.path.join(tmp, "b")
    cfgb = base_cfg(b_dir, iters_b, base=base_b)
    mutate(cfgb)
    cfgb.max_iter = iters_b
    cfgb.model.use_pre_trained.pt_filename = os.path.join(
        a_dir, "latest_checkpoint.txt")
    plc = cfgb.data.train.pseudo_label
    plc.enabled = True
    plc.pt_file = label_path
    cfgb.data.val.load_iid = True
    arrays_b = Dataset(cfgb).as_arrays()
    trb = Trainer(cfgb, seed=seed, logdir=b_dir)
    print(f"=== {name} [stage b] ===", flush=True)
    trb.train(arrays_b)
    val_ds = Dataset(cfgb, is_inference=True)
    psnr = trb.validate(val_ds, cfgb.max_iter, max_samples=3)
    jax.clear_caches()
    return psnr


def main():
    iters = int(os.environ.get("AB_ITERS", 300))
    study = os.environ.get("AB_STUDY", "shared")
    if study == "shared":
        levels = None

        def set_shared(n):
            def f(cfg):
                cfg.model.object.sdf.gradient.shared_levels = n
            return f

        # syn_sphere_a uses a smaller level count; read it from the config.
        probe = base_cfg("/tmp/quality_ab", iters)
        L = probe.model.object.sdf.encoding.levels
        variants = [
            ("shared=0 (exact)", set_shared(0)),
            ("shared=auto (finest exact)", set_shared("auto")),
            (f"shared={L} (all)", set_shared(L)),
        ]
    elif study == "dict":
        # Capacity split: the TPU scatter rate cliffs on table bytes
        # (PERF.md round-2 sweep), so smaller dict_size is the throughput
        # lever. The toy scene's dict_size 16 stands in for production 22;
        # a -3-bit cut mirrors 22 -> 19 proportionally.
        def set_dict(n):
            def f(cfg):
                cfg.model.object.sdf.encoding.hashgrid.dict_size = n
            return f

        variants = [
            ("dict=16 (config)", set_dict(16)),
            ("dict=13 (-3 bits)", set_dict(13)),
            ("dict=11 (-5 bits)", set_dict(11)),
        ]
    elif study == "budget":
        # Equal-PSNR sample-budget floor (round-1 occ study: uniform holds
        # PSNR at a quarter coarse budget on this scene; here the full
        # coarse x hierarchy grid, no occupancy placement).
        def set_budget(coarse, hier):
            def f(cfg):
                cfg.model.render.num_samples.coarse = coarse
                cfg.model.render.num_sample_hierarchy = hier
            return f

        variants = [
            ("coarse=48 hier=2 (config)", set_budget(48, 2)),
            ("coarse=24 hier=2", set_budget(24, 2)),
            ("coarse=16 hier=2", set_budget(16, 2)),
            ("coarse=16 hier=1", set_budget(16, 1)),
        ]
    elif study == "lf":
        # Level/feature restructure: scatter rows scale with levels (8 corner
        # rows per level per eval) while encoding width = levels*dim stays
        # constant — fewer, wider levels halve gradient rows per halving.
        # Toy config is L=8 F=4; production is L=16 F=8.
        def set_lf(levels, dim, init_active=None):
            def f(cfg):
                cfg.model.object.sdf.encoding.levels = levels
                cfg.model.object.sdf.encoding.hashgrid.dim = dim
                c2f = cfg.model.object.sdf.encoding.coarse2fine
                c2f.init_active_level = (
                    init_active if init_active is not None
                    else min(c2f.init_active_level, levels))
                # Keep the level-growth schedule spanning the same iteration
                # range: half the levels -> double the step.
                c2f.step = c2f.step * (8 // levels)
            return f

        variants = [
            ("L=8 F=4 (config)", set_lf(8, 4)),
            ("L=4 F=8", set_lf(4, 8, init_active=2)),
            ("L=4 F=16", set_lf(4, 16, init_active=2)),
        ]
    elif study == "headline":
        # The round-2 candidate headline config vs the reference-shaped
        # baseline: capacity split + sample-budget cut + level/feature
        # restructure together (toy mirror of prod dict 22->19,
        # coarse 64->32 / hier 4->2, L16F8 -> L8F16).
        def set_headline(cfg):
            cfg.model.object.sdf.encoding.hashgrid.dict_size = 13
            cfg.model.render.num_samples.coarse = 24
            cfg.model.render.num_sample_hierarchy = 1
            cfg.model.object.sdf.encoding.levels = 4
            cfg.model.object.sdf.encoding.hashgrid.dim = 8
            c2f = cfg.model.object.sdf.encoding.coarse2fine
            c2f.init_active_level = 2
            c2f.step = c2f.step * 2

        def set_headline_nolf(cfg):
            cfg.model.object.sdf.encoding.hashgrid.dict_size = 13
            cfg.model.render.num_samples.coarse = 24
            cfg.model.render.num_sample_hierarchy = 1

        variants = [
            ("baseline (dict=16, coarse=48)", lambda cfg: None),
            ("headline (dict13 coarse24 hier1 L4F8)", set_headline),
            ("headline-nolf (dict13 coarse24 hier1)", set_headline_nolf),
        ]
    elif study == "prodshape":
        # Faithful toy mirror of the PRODUCTION level/feature restructure
        # (L16F8 -> L8F16): the toy-native halving (L8->L4, 'lf'/'headline'
        # studies) overstates the cost because 4 levels span the resolution
        # range with growth 2.5 vs production's 1.8. Here both variants use
        # prod-like level counts and growth factors; B halves levels AND
        # total params exactly as dict19L16F8 -> dict18L8F16 does. Sample
        # budget identical in both (the budget cut is gated separately).
        def set_shape(levels, dim, dict_size):
            def f(cfg):
                e = cfg.model.object.sdf.encoding
                e.levels = levels
                e.hashgrid.dim = dim
                e.hashgrid.dict_size = dict_size
                e.coarse2fine.init_active_level = min(4, levels)
                e.coarse2fine.step = e.coarse2fine.step * (16 // levels) // 2
            return f

        def set_shape_wide(levels, dim, dict_size):
            base = set_shape(levels, dim, dict_size)

            def f(cfg):
                base(cfg)
                # Width recovery: the MXU is ~1% utilized on TPU, so doubling
                # the SDF MLP is nearly free there (BENCH_SDF_WIDTH probe);
                # tests whether MLP capacity recovers the level-halving gap.
                cfg.model.object.sdf.mlp.hidden_dim = (
                    cfg.model.object.sdf.mlp.hidden_dim * 2)
            return f

        variants = [
            ("A: L16 F4 dict13 (prod-shaped ref)", set_shape(16, 4, 13)),
            ("B: L8 F8 dict12 (prod-shaped headline)", set_shape(8, 8, 12)),
            ("C: B + 2x SDF width", set_shape_wide(8, 8, 12)),
        ]
    elif study == "dictwidth":
        # The ultra-small-table tier: v5e scatter runs 119 Mrows/s at
        # <= 256 KB tables vs 52.5 at the 512 KB-8 MB tier (PERF.md sweep),
        # so production dict 19 -> 14 would be the next full-step jump IF
        # quality holds. Toy mirror: dict16 -> 11 (-5 bits, same as
        # prod 19 -> 14). The 800-iter dict study measured -5 bits at
        # -0.29 dB under the TRUNCATED harness; this re-judges at
        # convergence length, with an MLP-width recovery variant (the MXU
        # is ~1% utilized, so width is throughput-free — BENCH_SDF_WIDTH
        # probe in PERF.md).
        def set_dw(dict_size, width_mul=1):
            def f(cfg):
                cfg.model.object.sdf.encoding.hashgrid.dict_size = dict_size
                if width_mul != 1:
                    cfg.model.object.sdf.mlp.hidden_dim = (
                        cfg.model.object.sdf.mlp.hidden_dim * width_mul)
            return f

        variants = [
            ("A: dict=16 (config)", set_dw(16)),
            ("B: dict=11 (-5 bits)", set_dw(11)),
            ("C: dict=11 + 2x SDF width", set_dw(11, 2)),
        ]
    elif study == "attrib":
        # Seed-1 collapse attribution. At seed 1 every reduced config so far
        # lands ~20.1 dB vs ~22.4 baseline (stencil round 1, prodshape L8,
        # headline-nolf) — a ~2.3 dB cliff, not graded degradation,
        # suggesting a bistable geometry failure the reductions tip over.
        # Isolate which knob tips it: dict alone, coarse alone, hierarchy
        # alone, and the pairwise dict+coarse (hier kept).
        def knobs(dict_size=None, coarse=None, hier=None):
            def f(cfg):
                if dict_size is not None:
                    cfg.model.object.sdf.encoding.hashgrid.dict_size = dict_size
                if coarse is not None:
                    cfg.model.render.num_samples.coarse = coarse
                if hier is not None:
                    cfg.model.render.num_sample_hierarchy = hier
            return f

        variants = [
            ("dict13 only", knobs(dict_size=13)),
            ("coarse24 only", knobs(coarse=24)),
            ("hier1 only", knobs(hier=1)),
            ("dict13+coarse24 (hier2)", knobs(dict_size=13, coarse=24)),
        ]
    elif study == "lvl12":
        # Milder level cut than prodshape's halving (which failed its gate:
        # -0.25/-2.08 dB by seed): L16 -> L12 at prod-like growth. Compare
        # against the prodshape A control (same config) measured in the same
        # seed's prodshape log.
        def set_shape12(cfg):
            e = cfg.model.object.sdf.encoding
            e.levels = 12
            e.hashgrid.dim = 4
            e.hashgrid.dict_size = 13
            e.coarse2fine.init_active_level = 4
            e.coarse2fine.step = int(e.coarse2fine.step * 16 / 12 / 2)

        def set_shape16(cfg):
            e = cfg.model.object.sdf.encoding
            e.levels = 16
            e.hashgrid.dim = 4
            e.hashgrid.dict_size = 13
            e.coarse2fine.init_active_level = 4
            e.coarse2fine.step = e.coarse2fine.step // 2

        variants = [
            ("A: L16 F4 dict13 (prod-shaped ref)", set_shape16),
            ("D: L12 F4 dict13", set_shape12),
        ]
    elif study == "hessfix":
        # Does the exact-tap strided hessian (gradient.hessian.mode=exact)
        # recover the stencil PSNR gap? Compare against the exact path and
        # the plain all-shared stencil at convergence.
        probe = base_cfg("/tmp/quality_ab", iters)
        L = probe.model.object.sdf.encoding.levels

        def set_hess(shared, mode, fraction=0.25):
            def f(cfg):
                cfg.model.object.sdf.gradient.shared_levels = shared
                cfg.model.object.sdf.gradient.hessian.mode = mode
                cfg.model.object.sdf.gradient.hessian.fraction = fraction
            return f

        variants = [
            ("exact (shared=0)", set_hess(0, "shared")),
            (f"shared={L} hess=shared", set_hess(L, "shared")),
            (f"shared={L} hess=exact f=0.25", set_hess(L, "exact", 0.25)),
            (f"shared={L} hess=exact f=0.125", set_hess(L, "exact", 0.125)),
            (f"shared={L} hess=exact f=1.0", set_hess(L, "exact", 1.0)),
        ]
    elif study == "composed":
        # Toy mirror of the COMPOSED production fast path (1905.6 rays/s on
        # the chip): dict+budget cut (headline-nolf) + all-shared stencil +
        # exact strided hessian, gated together because knob interactions
        # (e.g. stencil error at reduced capacity) are not covered by the
        # independent single-knob gates.
        probe = base_cfg("/tmp/quality_ab", iters)
        L = probe.model.object.sdf.encoding.levels

        def set_composed(cfg):
            cfg.model.object.sdf.encoding.hashgrid.dict_size = 13
            cfg.model.render.num_samples.coarse = 24
            cfg.model.render.num_sample_hierarchy = 1
            cfg.model.object.sdf.gradient.shared_levels = L
            cfg.model.object.sdf.gradient.hessian.mode = "exact"
            cfg.model.object.sdf.gradient.hessian.fraction = 0.25

        variants = [
            ("baseline (dict=16, coarse=48)", lambda cfg: None),
            ("composed (nolf+stencil+hessfix)", set_composed),
        ]
    elif study == "composed12":
        # Toy mirror of composed12 / composed12f8 (bench.py): the L16 -> L12
        # level cut AND the dict+budget+stencil+exact-hessian composition
        # together. Each knob passed (or is gating) independently; this cell
        # gates their interaction. Control is the prod-shaped L16 reference
        # (same as the prodshape/lvl12 studies' A cell, re-run here so the
        # pair shares a process/seed).
        def shape(levels):
            def f(cfg):
                e = cfg.model.object.sdf.encoding
                e.levels = levels
                e.hashgrid.dim = 4
                e.hashgrid.dict_size = 13
                e.coarse2fine.init_active_level = 4
                e.coarse2fine.step = int(e.coarse2fine.step * 16 / levels / 2)
            return f

        def set_composed_at(levels, fraction):
            base = shape(levels)

            def f(cfg):
                base(cfg)
                cfg.model.render.num_samples.coarse = 24
                cfg.model.render.num_sample_hierarchy = 1
                cfg.model.object.sdf.gradient.shared_levels = levels
                cfg.model.object.sdf.gradient.hessian.mode = "exact"
                cfg.model.object.sdf.gradient.hessian.fraction = fraction
            return f

        def set_composed12(fraction):
            return set_composed_at(12, fraction)

        def set_c12f8_dict(dict_size):
            base = set_composed12(0.125)

            def f(cfg):
                base(cfg)
                cfg.model.object.sdf.encoding.hashgrid.dict_size = dict_size
            return f

        def _c16_at_dict(set_composed_at_fn, dict_size):
            base = set_composed_at_fn(16, 0.25)

            def f(cfg):
                base(cfg)
                cfg.model.object.sdf.encoding.hashgrid.dict_size = dict_size
            return f

        variants = [
            ("A: L16 F4 dict13 (prod-shaped ref)", shape(16)),
            # Toy mirror of the CURRENT bench default (composed: L16,
            # f=0.25) inside this study's cell, so a seed can compare the
            # L12 candidates against the accepted default under the same
            # in-cell control (attribution for seed-specific fails).
            ("c16 composed mirror", set_composed_at(16, 0.25)),
            # L16 composed mirror at -2 capacity bits (prod dict19 -> 17
            # mirror): the dict ladder was only measured under the L12
            # composition; this cell prices the capacity cut for the
            # L16 default family. (name avoids "dict11"/"c16 composed".)
            ("c16d11 capacity", _c16_at_dict(set_composed_at, 11)),
            ("composed12 f=0.25", set_composed12(0.25)),
            ("composed12 f=0.125", set_composed12(0.125)),
            # Capacity ladder under the f=0.125 composition (toy mirror of
            # the production dict19 -> dict14 probe that measured 6998.9
            # rays/s). The toy cannot reproduce production collision ratios
            # (its finest level is far coarser), so these cells only bound
            # gross capacity starvation — a toy FAIL kills the cut, a toy
            # PASS is necessary-not-sufficient (real-data gate in round 3).
            # (names avoid the "f=0.125" substring so AB_VARIANTS selectors
            # for the plain composition don't pick these up)
            ("c12f8 dict11", set_c12f8_dict(11)),
            ("c12f8 dict9", set_c12f8_dict(9)),
            # -5 bits: the direct mirror of prod dict19 -> dict14 (the
            # 6998.9 rays/s 119 Mrows/s-tier probe).
            ("c12f8 dict8", set_c12f8_dict(8)),
        ]
    elif study == "slev":
        # Sampling-PDF level truncation under the full composed12f8 knobs:
        # the hierarchical importance-sampling SDF evals read only the first
        # K levels (models/neuralangelo.py sample_dists_all). Placement-only
        # knob — gradients/compositing unchanged — but sample placement
        # shifts what the loss sees, so it gates like any other cut.
        def c12f8():
            e_levels = 12

            def f(cfg):
                e = cfg.model.object.sdf.encoding
                e.levels = e_levels
                e.hashgrid.dim = 4
                e.hashgrid.dict_size = 13
                e.coarse2fine.init_active_level = 4
                e.coarse2fine.step = int(e.coarse2fine.step * 16 / e_levels / 2)
                cfg.model.render.num_samples.coarse = 24
                cfg.model.render.num_sample_hierarchy = 1
                cfg.model.object.sdf.gradient.shared_levels = e_levels
                cfg.model.object.sdf.gradient.hessian.mode = "exact"
                cfg.model.object.sdf.gradient.hessian.fraction = 0.125
            return f

        def with_slev(k):
            base = c12f8()

            def f(cfg):
                base(cfg)
                cfg.model.render.sampling_levels = k
            return f

        variants = [
            ("A: composed12f8 (all sampling levels)", c12f8()),
            ("slev=6", with_slev(6)),
            ("slev=4", with_slev(4)),
        ]
    elif study == "slev16":
        # Sampling-PDF level truncation under the L16 composed(+cscot)
        # family — the flip-relevant variant after the L12 seed-3 rejection.
        # cs17_slev4 probe: 6164.9 vs 5684.8 rays/s (+8.4%) at the
        # composedcs17 point. Placement-only knob; in-cell control.
        def c16cs(slev=None, csamp=True):
            def f(cfg):
                cfg.model.object.sdf.encoding.hashgrid.dict_size = 13
                cfg.model.render.num_samples.coarse = 24
                cfg.model.render.num_sample_hierarchy = 1
                L = cfg.model.object.sdf.encoding.levels
                cfg.model.object.sdf.gradient.shared_levels = L
                cfg.model.object.sdf.gradient.hessian.mode = "exact"
                cfg.model.object.sdf.gradient.hessian.fraction = 0.25
                if csamp:
                    cs = cfg.model.object.sdf.gradient.corner_sample
                    cs.enabled = True
                    cs.floor = 0.125
                    cs.mode = "cotangent"
                if slev is not None:
                    cfg.model.render.sampling_levels = slev
            return f

        variants = [
            ("A: c16 cscot (all sampling levels)", c16cs()),
            ("c16 cscot slev=6", c16cs(slev=6)),
            ("c16 cscot slev=4", c16cs(slev=4)),
        ]
    elif study == "csamp":
        # Corner-sampled backward table scatter under the full composed12f8
        # knobs: forward identical, table gradients become an unbiased
        # one-corner-per-point subsample (ops/hashgrid.corner_sampled_combine)
        # — 8x fewer backward scatter rows for pure gradient noise. The gate
        # measures whether that noise costs convergence PSNR.
        def c12f8_base():
            e_levels = 12

            def f(cfg):
                e = cfg.model.object.sdf.encoding
                e.levels = e_levels
                e.hashgrid.dim = 4
                e.hashgrid.dict_size = 13
                e.coarse2fine.init_active_level = 4
                e.coarse2fine.step = int(e.coarse2fine.step * 16 / e_levels / 2)
                cfg.model.render.num_samples.coarse = 24
                cfg.model.render.num_sample_hierarchy = 1
                cfg.model.object.sdf.gradient.shared_levels = e_levels
                cfg.model.object.sdf.gradient.hessian.mode = "exact"
                cfg.model.object.sdf.gradient.hessian.fraction = 0.125
            return f

        def with_csamp(floor, mode="center", corners=1):
            base = c12f8_base()

            def f(cfg):
                base(cfg)
                cs = cfg.model.object.sdf.gradient.corner_sample
                cs.enabled = True
                cs.floor = floor
                cs.mode = mode
                cs.corners = corners
            return f

        # L16 mirror of the CURRENT default (composed: f=0.25) — the seed-3
        # attribution implicated the L12 cut, so the flip-relevant csamp gate
        # is on the L16 composition. dict stays 13 (prod dict19 mirror).
        def c16_base(cfg):
            cfg.model.object.sdf.encoding.hashgrid.dict_size = 13
            cfg.model.render.num_samples.coarse = 24
            cfg.model.render.num_sample_hierarchy = 1
            L = cfg.model.object.sdf.encoding.levels
            cfg.model.object.sdf.gradient.shared_levels = L
            cfg.model.object.sdf.gradient.hessian.mode = "exact"
            cfg.model.object.sdf.gradient.hessian.fraction = 0.25

        def c16_auto(csamp_lr3=False):
            def f(cfg):
                c16_base(cfg)
                cfg.model.object.sdf.gradient.shared_levels = "auto"
                cfg.model.object.sdf.gradient.hessian.mode = "shared"
                if csamp_lr3:
                    cs = cfg.model.object.sdf.gradient.corner_sample
                    cs.enabled = True
                    cs.floor = 0.125
                    cs.mode = "top1cot"
                    cfg.optim.lr_scales = {"hash_table": 2.83}
            return f

        def c16_csamp(mode="center", corners=1, exact_finest=0, lr_scale=None,
                      hess_fraction=None):
            def f(cfg):
                c16_base(cfg)
                cs = cfg.model.object.sdf.gradient.corner_sample
                cs.enabled = True
                cs.floor = 0.125
                cs.mode = mode
                cs.corners = corners
                cs.exact_finest = exact_finest
                if hess_fraction is not None:
                    cfg.model.object.sdf.gradient.hessian.fraction = hess_fraction
                if lr_scale is not None:
                    # Compensate Adam's v-hat inflation under the sampled
                    # scatter (~1/q per coordinate -> effective table LR
                    # shrinks by its sqrt). Mechanism evidence: exact_finest=2
                    # changed NOTHING (23.61 vs 23.62 at s0) — the gap is
                    # uniform across levels, as the v-hat theory predicts.
                    cfg.optim.lr_scales = {"hash_table": lr_scale}
            return f

        # NOTE (round 3): the original "c16 csamp"/"csamp floor=" variants
        # used the CENTER-weight sampling distribution — the r2q gates
        # measured it collapsing on the sphere (-3.73/-0.98 dB at s0/s1)
        # because the stencil's signed tap weights mismatch the center-only
        # q (importance ratio up to 8/floor). The "-cot" variants sample
        # corners from the actual per-corner cotangent norm (the
        # variance-optimal q; ops/hashgrid mode="cotangent"). The center
        # variants keep mode pinned so the rejected evidence stays
        # reproducible.
        variants = [
            ("A: composed12f8 (exact scatter)", c12f8_base()),
            ("csamp floor=0.125", with_csamp(0.125, mode="center")),
            ("csamp floor=0.03", with_csamp(0.03, mode="center")),
            ("csamp-cot L12", with_csamp(0.125, mode="cotangent")),
            ("B: c16 composed (exact scatter)", c16_base),
            ("c16 csamp", c16_csamp(mode="center")),
            ("c16 csamp-cot", c16_csamp(mode="cotangent")),
            ("c16 csamp-k2cot", c16_csamp(mode="cotangent", corners=2)),
            # Rao-Blackwellized: exact argmax-norm row + 1 sampled residual
            # row (2 rows/point, variance well below k2cot's 2 iid draws).
            ("c16 csamp-top1", c16_csamp(mode="top1cot")),
            # Fallback dial: exact scatter on the 2 finest levels, top1cot on
            # the rest (rows/point: 14*2 + 2*8 = 44 vs 32 full-top1, 128 exact).
            ("c16 csamp-top1xf2", c16_csamp(mode="top1cot", exact_finest=2)),
            # Adam v-hat compensation arms (lr_scales on the tables only).
            ("c16 csamp-top1-lr2", c16_csamp(mode="top1cot", lr_scale=2.0)),
            ("c16 csamp-top1-lr3", c16_csamp(mode="top1cot", lr_scale=2.83)),
            # + hessian.fraction 0.25 -> 0.125 composition (chip: +17.5% at
            # the top1cot point, 2703.3 -> 3177.7 rays/s; the f=0.125 arm
            # passed its own 3-seed gate at L12 in round 2).
            ("c16 csamp-top1-lr3-hf8", c16_csamp(mode="top1cot", lr_scale=2.83,
                                                 hess_fraction=0.125)),
            # shared_levels="auto" re-judge at convergence length (the
            # round-1 rejection was an 800-iter cell, i.e. mid-annealing —
            # the harness later shown to mis-measure): share all but the
            # finest level so the taps carry REAL curvature from the
            # exact-gathered finest level, and DROP the exact-hessian pass
            # entirely (hessian.mode=shared) — deletes a full second
            # encoder pass (-16.8M gather AND scatter rows at +4.2M each
            # for the unshared finest taps; projected ~2800 rays/s exact /
            # ~4100 with top1cot+lr3 at d19).
            ("c16 auto-hshared", c16_auto()),
            ("c16 csamp-top1-lr3-auto", c16_auto(csamp_lr3=True)),
        ]
    elif study == "fhalf":
        # Equal-BYTES feature-width question at the ultra-small-table tier:
        # production dict14F8 and dict15F4 have identical per-level table
        # bytes (256 KB bf16 = the 119 Mrows/s scatter tier) but F4 doubles
        # the row count (fewer hash collisions) while halving per-level
        # feature width. Scatter ROWS (and thus speed) are F-independent,
        # so whichever wins on quality is free. The toy runs F4 everywhere,
        # so this study uses an F8 control at equal bytes to measure the
        # sign of F-halving; both arms carry the full composed12f8 knobs.
        def set_f(levels, dim, dict_size):
            def f(cfg):
                e = cfg.model.object.sdf.encoding
                e.levels = levels
                e.hashgrid.dim = dim
                e.hashgrid.dict_size = dict_size
                e.coarse2fine.init_active_level = 4
                e.coarse2fine.step = int(e.coarse2fine.step * 16 / levels / 2)
                cfg.model.render.num_samples.coarse = 24
                cfg.model.render.num_sample_hierarchy = 1
                cfg.model.object.sdf.gradient.shared_levels = levels
                cfg.model.object.sdf.gradient.hessian.mode = "exact"
                cfg.model.object.sdf.gradient.hessian.fraction = 0.125
            return f

        variants = [
            ("A: L12 F8 dict12 (equal-bytes F8)", set_f(12, 8, 12)),
            ("B: L12 F4 dict13 (equal-bytes F4, 2x rows)", set_f(12, 4, 13)),
        ]
    elif study == "composed12topk":
        # The full round-2 fast-path composition: composed12 at hessian
        # fraction 0.125 PLUS importance-subsampled gradients. Gated as one
        # unit (this is the bench composed12f8+topk operating point); the A
        # control matches the composed12/prodshape studies' control cell.
        def shape16c(cfg):
            e = cfg.model.object.sdf.encoding
            e.levels = 16
            e.hashgrid.dim = 4
            e.hashgrid.dict_size = 13
            e.coarse2fine.init_active_level = 4
            e.coarse2fine.step = cfg.model.object.sdf.encoding.coarse2fine.step // 2

        def set_c12_topk(topk, stride):
            def f(cfg):
                e = cfg.model.object.sdf.encoding
                e.levels = 12
                e.hashgrid.dim = 4
                e.hashgrid.dict_size = 13
                e.coarse2fine.init_active_level = 4
                e.coarse2fine.step = int(e.coarse2fine.step * 16 / 12 / 2)
                cfg.model.render.num_samples.coarse = 24
                cfg.model.render.num_sample_hierarchy = 1
                cfg.model.object.sdf.gradient.shared_levels = 12
                cfg.model.object.sdf.gradient.hessian.mode = "exact"
                cfg.model.object.sdf.gradient.hessian.fraction = 0.125
                sub = cfg.model.object.sdf.gradient.subsample
                sub.enabled = True
                sub.topk = topk
                sub.stride = stride
            return f

        variants = [
            ("A: L16 F4 dict13 (prod-shaped ref)", shape16c),
            ("c12f8+topk24 s8", set_c12_topk(24, 8)),
            ("c12f8+topk16 s8", set_c12_topk(16, 8)),
        ]
    elif study == "topk":
        # Importance-subsampled encoder gradients: loss values unchanged,
        # parameter gradients restricted to the top-K compositing-weight
        # samples + every stride-th sample (tests/test_grad_subsample.py).
        # Toy S = 48 + 2x8 = 64 samples; production budget configs run S=64
        # too, so K transfers directly.
        def set_topk(topk, stride):
            def f(cfg):
                sub = cfg.model.object.sdf.gradient.subsample
                sub.enabled = True
                sub.topk = topk
                sub.stride = stride
            return f

        variants = [
            ("full-grad (off)", lambda cfg: None),
            ("topk=24 stride=8", set_topk(24, 8)),
            ("topk=16 stride=8", set_topk(16, 8)),
            ("topk=8 stride=8", set_topk(8, 8)),
        ]
    elif study == "prodscale":
        # PRODUCTION-SHAPED semantics gate (round-3 verdict item 2): the real
        # L16F8 dict19 model (syn_prodscale_a.yaml) on the 256x256 cluttered
        # scene, pricing the shipped default's deltas from reference
        # semantics at production shape:
        #   A: exact 4-tap gradients, 64 + 4x16 samples (reference gradient
        #      + budget semantics; dict19 in all arms — see the yaml header)
        #   B: + sample budget 32 + 2x16 ("budget")
        #   C: + all-shared stencil + exact strided hessian f=0.25 (the
        #      shipped "composed" default)
        #   D: + corner-sampled backward scatter (cotangent mode)
        # Chip cost at 1024 rays, 3000 iters: A ~2h, B ~1h, C ~0.5h, D ~0.3h.
        os.environ.setdefault("AB_BASE_CONFIG", "syn_prodscale_a.yaml")

        def scale_sched(cfg):
            # Keep the warmup/growth/decay FRACTIONS of the 3000-iter design
            # when AB_ITERS differs.
            s = cfg.max_iter / 3000.0
            if s != 1.0:
                cfg.optim.sched.warm_up_end = int(300 * s)
                cfg.optim.sched.two_steps = [int(1800 * s), int(2400 * s)]
                cfg.model.object.sdf.encoding.coarse2fine.step = max(int(108 * s), 1)

        def exact_c64h4(cfg):
            scale_sched(cfg)
            cfg.model.render.num_samples.coarse = 64
            cfg.model.render.num_sample_hierarchy = 4

        def budget(cfg):
            scale_sched(cfg)
            cfg.model.render.num_samples.coarse = 32
            cfg.model.render.num_sample_hierarchy = 2

        def composed(cfg):
            budget(cfg)
            L = cfg.model.object.sdf.encoding.levels
            cfg.model.object.sdf.gradient.shared_levels = L
            cfg.model.object.sdf.gradient.hessian.mode = "exact"
            cfg.model.object.sdf.gradient.hessian.fraction = 0.25

        def composed_cscot(cfg):
            composed(cfg)
            cs = cfg.model.object.sdf.gradient.corner_sample
            cs.enabled = True
            cs.floor = 0.125
            cs.mode = "cotangent"

        def composed_cstop1(cfg):
            # The Rao-Blackwellized draw (exact argmax row + 1 sampled
            # residual row, 2 rows/point) — the round-3 flip candidate.
            composed(cfg)
            cs = cfg.model.object.sdf.gradient.corner_sample
            cs.enabled = True
            cs.floor = 0.125
            cs.mode = "top1cot"

        def composed_cstop1_lr3(cfg):
            # + Adam v-hat compensation (table LR x2.83 ~ sqrt(8)): the toy
            # lrx arms recover plain top1cot's uniform ~-0.3 dB to -0.00
            # (s1) / -0.02 (s3) — this is the ACTUAL flip configuration, so
            # the production-shape evidence prices it, not plain top1cot.
            composed_cstop1(cfg)
            cfg.optim.lr_scales = {"hash_table": 2.83}

        def composed_f4(cfg):
            # Equal-BYTES F-halving at production shape (fhalf toy result:
            # F4 at 2x rows beats F8 by +0.41 dB at equal table bytes —
            # scatter rows and speed are F-independent): dict20 F4 vs the
            # default dict19 F8. Narrower encoding (L16*4 = 64) feeds the
            # same 256-wide MLPs.
            composed(cfg)
            cfg.model.object.sdf.encoding.hashgrid.dict_size = 20
            cfg.model.object.sdf.encoding.hashgrid.dim = 4

        def composed_hf8(cfg):
            # hessian.fraction 0.25 -> 0.125 on the EXACT-scatter composed
            # path (the hessian site is a full second encoder pass; halving
            # its points cuts exact-path scatter rows 25%, gather rows 18% —
            # r3d static attribution). Round-4 flip candidate after D3's
            # production-shape failure parked the csamp family.
            composed(cfg)
            cfg.model.object.sdf.gradient.hessian.fraction = 0.125

        def composed_hf8_slev4(cfg):
            # + hierarchical-PDF placement evals truncated to the 4 coarsest
            # hash levels (exact compositing; placement-only semantics).
            composed_hf8(cfg)
            cfg.model.render.sampling_levels = 4

        def composed_auto(cfg):
            # shared_levels="auto" (share all but the finest active level,
            # whose taps carry real curvature) + hessian.mode=shared: deletes
            # the exact-hessian second encoder pass entirely — the biggest
            # exact-scatter row cut left (-16.8M scatter AND gather rows at
            # +4.2M each for the unshared finest taps).
            budget(cfg)
            cfg.model.object.sdf.gradient.shared_levels = "auto"
            cfg.model.object.sdf.gradient.hessian.mode = "shared"

        def composed_auto_slev4(cfg):
            composed_auto(cfg)
            cfg.model.render.sampling_levels = 4

        variants = [
            ("A: exact c64h4 (ref semantics)", exact_c64h4),
            ("B: budget c32h2 exact", budget),
            ("C: composed (shipped default)", composed),
            ("D: composed+cscot", composed_cscot),
            ("D2: composed+cstop1", composed_cstop1),
            ("D3: composed+cstop1-lr3", composed_cstop1_lr3),
            ("E: composed dict20F4 (equal-bytes)", composed_f4),
            ("F: composed+hf8 (exact)", composed_hf8),
            ("G: composed+hf8+slev4 (exact)", composed_hf8_slev4),
            ("H: composed+auto-hshared (exact finest)", composed_auto),
            ("I: composed+auto+slev4", composed_auto_slev4),
        ]
    elif study == "occ":
        def set_occ(enabled, coarse, hier):
            def f(cfg):
                cfg.model.render.occupancy.enabled = enabled
                cfg.model.render.num_samples.coarse = coarse
                cfg.model.render.num_sample_hierarchy = hier
            return f

        # Equal-budget uniform controls isolate what occupancy placement
        # itself buys at each reduced budget.
        variants = [
            ("uniform coarse=16", set_occ(False, 16, 2)),
            ("uniform coarse=8", set_occ(False, 8, 2)),
            ("occ coarse=8", set_occ(True, 8, 2)),
            ("uniform coarse=4", set_occ(False, 4, 2)),
            ("occ coarse=4", set_occ(True, 4, 2)),
        ]
    else:
        raise SystemExit(f"unknown AB_STUDY={study}")

    # AB_VARIANTS: comma-separated substrings selecting a subset of the
    # study's variants by name (saves serial CPU time when some cells are
    # already measured — e.g. AB_VARIANTS="hess=exact"). A selector ending
    # in "$" requires an EXACT name match (e.g. "c16 csamp-top1-lr3$" picks
    # only that arm, not its -hf8/-auto extensions).
    sel = os.environ.get("AB_VARIANTS")
    if sel:
        keys = [s.strip() for s in sel.split(",") if s.strip()]

        def _match(name, k):
            return name == k[:-1] if k.endswith("$") else k in name

        variants = [(n, m) for n, m in variants if any(_match(n, k) for k in keys)]
    runner = run_stageb_variant if os.environ.get("AB_STAGEB") else run_variant
    for name, mutate in variants:
        runner(name, mutate, iters)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
