#!/usr/bin/env python
"""Mesh extraction CLI.

Counterpart of the reference ``projects/neuralangelo/scripts/extract_mesh.py``:
load a trained SDF checkpoint, evaluate the field block-wise on device, run
native marching tetrahedra, export a (optionally textured) PLY.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Extract mesh")
    parser.add_argument("--config", required=True)
    parser.add_argument("--logdir", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--output_file", default=None)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--block_res", type=int, default=128)
    parser.add_argument("--textured", action="store_true")
    parser.add_argument("--keep_lcc", action="store_true",
                        help="keep only the largest connected component "
                             "(the reference's filter_lcc)")
    args, cfg_cmd = parser.parse_known_args()

    from mlinerf_tpu.config import Config, resolve
    from mlinerf_tpu.pipelines import mesh_extract
    from mlinerf_tpu.ops import mesh as mesh_ops

    base_logdir = args.logdir or os.path.join(
        "logs", os.path.splitext(os.path.basename(args.config))[0]
    )
    if args.checkpoint is None:
        with open(os.path.join(base_logdir, "latest_checkpoint.txt")) as f:
            args.checkpoint = os.path.join(base_logdir, f.read().strip())
    cfg = Config(args.config, cli_args=cfg_cmd)
    if cfg.model.get("use_pre_trained"):
        cfg.model.pop("use_pre_trained")
    if cfg.data.train.get("pseudo_label"):
        cfg.data.train.pseudo_label.enabled = False
    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, is_inference=True, logdir=base_logdir)
    trainer.load_checkpoint(args.checkpoint, resume=False, load_opt=False)

    if cfg.data.get("bounding_type") == "box" and cfg.data.get("bounding_box_aabb"):
        aabb = cfg.data.bounding_box_aabb
        bounds_min, bounds_max = aabb[:3], aabb[3:]
    else:
        bounds_min, bounds_max = (-1, -1, -1), (1, 1, 1)

    sdf_fn = mesh_extract.trainer_sdf_fn(trainer)
    texture_fn = mesh_extract.trainer_texture_fn(trainer) if args.textured else None

    verts, faces, colors = mesh_extract.extract_mesh(
        sdf_fn, bounds_min, bounds_max, resolution=args.resolution,
        block_res=args.block_res, texture_fn=texture_fn,
        filter_lcc=args.keep_lcc,
    )
    out = args.output_file or os.path.join(base_logdir, "mesh.ply")
    mesh_ops.save_ply(out, verts, faces, colors)
    print(f"Extracted {len(verts)} vertices / {len(faces)} faces -> {out}")


if __name__ == "__main__":
    main()
