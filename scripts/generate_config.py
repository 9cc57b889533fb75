#!/usr/bin/env python
"""Generate an experiment config for a custom capture.

Counterpart of ``projects/neuralangelo/scripts/generate_config.py``: writes a
YAML inheriting the SDF base with scene-specific paths, bounding volume and
image sizes derived from the transforms.json of a preprocessed capture.
"""

import argparse
import json
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sequence_name", required=True)
    parser.add_argument("--data_dir", required=True, help="dir containing transforms.json")
    parser.add_argument("--annotation", default="transforms.json")
    parser.add_argument("--scene_type", choices=["object", "indoor", "outdoor"], default="object")
    parser.add_argument("--multi_light", action="store_true", help="use the Lumen model")
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    with open(os.path.join(args.data_dir, args.annotation)) as f:
        meta = json.load(f)
    H = int(meta.get("h", 512))
    W = int(meta.get("w", 512))
    # Cap training resolution at ~1k on the long side (reference heuristic).
    scale = max(max(H, W) / 1024.0, 1.0)
    H, W = int(H / scale), int(W / scale)

    cfg = {
        "_parent_": "base_sdf.yaml",
        "trainer": {"type": "lumen" if args.multi_light else "neuralangelo"},
        "model": {
            "type": "lumen" if args.multi_light else "neuralangelo",
            "object": {"sdf": {"mlp": {"inside_out": args.scene_type == "indoor"}}},
            "background": {"enabled": args.scene_type == "outdoor"},
        },
        "data": {
            "type": "lumen" if args.multi_light else "neuralangelo",
            "root": args.data_dir,
            "train": {
                "annotation": os.path.join(args.data_dir, args.annotation),
                "image_size": [H, W],
                "batch_size": 1,
            },
            "val": {
                "annotation": os.path.join(args.data_dir, args.annotation),
                "image_size": [max(H // 2, 64), max(W // 2, 64)],
                "batch_size": 1,
                "subset": 4,
            },
            "bounding_type": "box" if "bounding_box_aabb" in meta else "unit_sphere",
        },
    }
    if "bounding_box_aabb" in meta:
        cfg["data"]["bounding_box_aabb"] = meta["bounding_box_aabb"]
    out = args.output or os.path.join("configs", f"custom_{args.sequence_name}.yaml")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        yaml.safe_dump(cfg, f, default_flow_style=False, indent=4)
    print("wrote", out)


if __name__ == "__main__":
    main()
