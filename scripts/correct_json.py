#!/usr/bin/env python
"""Fix frame file_path extensions/patterns in a transforms.json.

Counterpart of ``projects/NeuralLumen/scripts/correct_json.py`` (filename
regex fixup for annotations whose image paths drifted from the files on
disk).
"""

import argparse
import json
import re


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", required=True, help="annotation to fix in place")
    parser.add_argument("--pattern", required=True, help="regex applied to each file_path")
    parser.add_argument("--replacement", required=True)
    args = parser.parse_args()
    with open(args.json) as f:
        meta = json.load(f)
    n = 0
    for frame in meta.get("frames", []):
        new = re.sub(args.pattern, args.replacement, frame["file_path"])
        if new != frame["file_path"]:
            frame["file_path"] = new
            n += 1
    with open(args.json, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"rewrote {n} file paths in {args.json}")


if __name__ == "__main__":
    main()
