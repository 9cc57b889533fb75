#!/usr/bin/env python
"""Training CLI.

Counterpart of the reference ``train.py`` (args and flow at
/root/reference/train.py:26-105): config + dot-path overrides, logdir with
``latest_checkpoint.txt`` convention, resume, optional profiling. The
process-per-GPU/DDP plumbing is replaced by the single-controller JAX
runtime — multi-chip runs use the same command (mesh spans all devices).
"""

import argparse
import os
import sys


def parse_args():
    parser = argparse.ArgumentParser(description="Training")
    parser.add_argument("--config", required=True, help="Path to the training config file.")
    parser.add_argument("--logdir", help="Dir for saving logs and models.")
    parser.add_argument("--checkpoint", default=None, help="Checkpoint path.")
    parser.add_argument("--seed", type=int, default=0, help="Random seed.")
    parser.add_argument("--local_rank", type=int, default=0, help="(compat; unused on TPU)")
    parser.add_argument("--single_gpu", action="store_true", help="(compat) disable the device mesh")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--profile", action="store_true", help="Capture a jax.profiler trace.")
    parser.add_argument("--show_pbar", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--wandb_name", default="default", type=str)
    parser.add_argument("--resume", action="store_true")
    args, cfg_cmd = parser.parse_known_args()
    return args, cfg_cmd


def main():
    args, cfg_cmd = parse_args()
    from mlinerf_tpu.config import Config, resolve

    cfg = Config(args.config, cli_args=cfg_cmd)
    cfg["wandb"] = args.wandb
    cfg["wandb_name"] = args.wandb_name
    if args.single_gpu:
        cfg.setdefault("runtime", {})
        cfg.runtime.mesh = "none"
    # Multi-host (DCN) bring-up must precede every other jax call; after it
    # the mesh/sharding code is unchanged (reference init_dist counterpart,
    # imaginaire/utils/distributed.py:21-27). No-op unless runtime.multihost.
    from mlinerf_tpu.parallel import mesh as pmesh

    pmesh.init_multihost(cfg)
    logdir = args.logdir or os.path.join("logs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(logdir, exist_ok=True)
    if pmesh.is_main_process():
        cfg.save_config(logdir)

    Dataset = resolve("dataset", cfg.data.type)
    train_dataset = Dataset(cfg)
    val_dataset = Dataset(cfg, is_inference=True)
    arrays = train_dataset.as_arrays()

    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, is_inference=False, seed=args.seed, logdir=logdir)
    trainer.load_checkpoint(args.checkpoint, resume=args.resume)

    if args.profile:
        import jax

        profile_dir = os.path.join(logdir, "profile")
        os.makedirs(profile_dir, exist_ok=True)
        with jax.profiler.trace(profile_dir):
            trainer.train(arrays, val_dataset=val_dataset, show_progress=True)
        # Reference parity: print the top-op table after a profiled run
        # (imaginaire/trainers/base.py:500-521).
        from mlinerf_tpu.utils import profiling

        profiling.print_breakdown(profile_dir)
    else:
        trainer.train(arrays, val_dataset=val_dataset, show_progress=args.show_pbar or True)
    trainer.save_checkpoint(latest=True)
    trainer.checkpointer.wait()
    print(f"Done. Logs in {logdir}")


if __name__ == "__main__":
    main()
