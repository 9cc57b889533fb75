#!/usr/bin/env python
"""Inference CLI.

Counterpart of the reference ``test.py`` (/root/reference/test.py:27-177).
Modes: ``{image,rene,video,lights,unpairlights,limitedlights,singlelight}_
{train|test}[_idx1_idx2]``. Outputs land in ``<logdir>/output_<mode>``.
"""

import argparse
import os


def parse_args():
    parser = argparse.ArgumentParser(description="Inference")
    parser.add_argument("--config", required=True)
    parser.add_argument("--logdir", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--single_gpu", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--show_pbar", action="store_true")
    parser.add_argument("--inference_mode", type=str, default="image_test")
    parser.add_argument("--anno", type=str, default=None)
    args, cfg_cmd = parser.parse_known_args()
    return args, cfg_cmd


def main():
    args, cfg_cmd = parse_args()
    from mlinerf_tpu.config import Config, resolve
    from mlinerf_tpu.pipelines import inference as inf

    base_logdir = args.logdir or os.path.join(
        "logs", os.path.splitext(os.path.basename(args.config))[0]
    )
    if args.checkpoint is None:
        with open(os.path.join(base_logdir, "latest_checkpoint.txt")) as f:
            args.checkpoint = os.path.join(base_logdir, f.read().strip())

    cfg = Config(args.config, cli_args=cfg_cmd)
    # Multi-host runs: bring up DCN for mesh parity with train.py, but the
    # chunked renderer is single-controller — non-main processes exit rather
    # than redundantly render and race on the same output files.
    from mlinerf_tpu.parallel import mesh as pmesh

    pmesh.init_multihost(cfg)
    if not pmesh.is_main_process():
        # Wait for main instead of returning: a clean exit here while
        # process 0 is still rendering trips the JAX distributed heartbeat
        # (coordinator sees a dead peer) and kills the main render.
        pmesh.sync_processes("inference_done")
        return
    # Inference never loads pseudo labels or re-warm-starts (reference
    # test.py:90-101).
    if cfg.model.get("use_pre_trained"):
        cfg.model.pop("use_pre_trained")
    if cfg.data.train.get("pseudo_label"):
        cfg.data.train.pseudo_label.enabled = False
    cfg.data.preload = True

    mode_parts = args.inference_mode.split("_")
    mode, split_mode = mode_parts[0], mode_parts[1]

    Dataset = resolve("dataset", cfg.data.type)
    if split_mode == "train":
        dataset = Dataset(cfg)
        if hasattr(dataset, "sample_train_rays"):
            dataset.sample_train_rays = False
        image_size = cfg.data.train.image_size
    elif split_mode == "test":
        if args.anno is not None:
            cfg.data.val.annotation = os.path.join(
                os.path.dirname(cfg.data.val.annotation), args.anno
            )
            cfg.data.val.subset = 0
        dataset = Dataset(cfg, is_inference=True)
        image_size = cfg.data.val.image_size
    else:
        raise NotImplementedError(split_mode)

    Trainer = resolve("trainer", cfg.trainer.type)
    trainer = Trainer(cfg, is_inference=True, seed=args.seed, logdir=base_logdir)
    trainer.load_checkpoint(args.checkpoint, resume=False, load_opt=False)

    output_dir = os.path.join(base_logdir, "output_" + mode + ("_" + split_mode if split_mode != "test" else ""))
    os.makedirs(output_dir, exist_ok=True)

    if mode == "image":
        inf.test_save(trainer, dataset, output_dir, image_size=image_size, show_pbar=args.show_pbar)
    elif mode == "rene":
        inf.test_images(trainer, dataset, output_dir, setting_list=["c25l10"],
                        image_size=image_size, show_pbar=args.show_pbar)
    elif mode == "video":
        idx1, idx2 = int(mode_parts[2]), int(mode_parts[3])
        network_mode = cfg.model.object.rgb.get("network_mode") if "object" in cfg.model else None
        if network_mode:
            n = len(network_mode.split("_"))
            content = ("rgb", "gt", "o_r", "o_s", "o_re") if n == 3 else ("rgb", "gt", "o_r", "o_s")
        else:
            content = ("rgb", "gt")
        inf.test_video(trainer, dataset, idx1, idx2, output_dir, video_content=content,
                       image_size=image_size, show_pbar=args.show_pbar)
    elif mode in ("lights", "unpairlights", "limitedlights", "singlelight"):
        dataset_type = {"lights": "pair", "unpairlights": "unpair",
                        "limitedlights": "limitedlights", "singlelight": "limitedlights"}[mode]
        sample_num = 1 if mode == "singlelight" else 4
        trainer.test_all_light(dataset, output_dir, mode="test", dataset_type=dataset_type,
                               sample_num=sample_num, seed=999)
    else:
        raise NotImplementedError(mode)
    print(f"Outputs written to {output_dir}")
    pmesh.sync_processes("inference_done")


if __name__ == "__main__":
    main()
