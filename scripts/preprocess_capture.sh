#!/bin/bash
# Custom-capture preprocessing: video (or raw photos) -> training-ready scene.
#
# Executable counterpart of the reference's capture on-ramp
# (projects/neuralangelo/scripts/run_ffmpeg.sh + run_colmap.sh +
# convert_data_to_json.py + generate_config.py) — the 5-command pipeline for
# bringing a user's own capture into the framework. The ffmpeg/COLMAP flags
# mirror docs/custom_capture.md (the documented equivalent); this script
# chains them with the in-tree converters so a single invocation produces
# ${SCENE}/transforms.json plus a generated config.
#
# Usage:
#   scripts/preprocess_capture.sh SCENE_DIR [VIDEO] [--fps N] [--matcher M]
#       [--scene_type object|indoor|outdoor]
#
#   SCENE_DIR   working dir; images land in SCENE_DIR/images_raw
#   VIDEO       optional capture video; omit if SCENE_DIR/images_raw is
#               already populated with photos
#   --matcher   sequential_matcher (video, default) | exhaustive_matcher
#
# Requires ffmpeg (only with VIDEO) and colmap on PATH; both are standard
# third-party tools, checked up front with actionable errors.
set -euo pipefail
cd "$(dirname "$0")/.."

SCENE="${1:?usage: preprocess_capture.sh SCENE_DIR [VIDEO] [--fps N] ...}"
shift
VIDEO=""
if [ "${1:-}" != "" ] && [[ "${1:-}" != --* ]]; then
  VIDEO="$1"; shift
fi
FPS=2
MATCHER=sequential_matcher
SCENE_TYPE=object
while [ $# -gt 0 ]; do
  case "$1" in
    --fps) FPS="$2"; shift 2 ;;
    --matcher) MATCHER="$2"; shift 2 ;;
    --scene_type) SCENE_TYPE="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

mkdir -p "$SCENE/images_raw"

# 1. Frames from video (reference run_ffmpeg.sh).
if [ -n "$VIDEO" ]; then
  command -v ffmpeg >/dev/null || {
    echo "ffmpeg not on PATH (needed to split '$VIDEO' into frames)" >&2; exit 3; }
  ffmpeg -i "$VIDEO" -qscale:v 2 -vf "fps=${FPS}" "$SCENE/images_raw/%06d.jpg"
fi
n_imgs=$(ls "$SCENE/images_raw" 2>/dev/null | wc -l)
[ "$n_imgs" -ge 3 ] || {
  echo "need >=3 images in $SCENE/images_raw (have $n_imgs); pass a VIDEO or copy photos there" >&2
  exit 3; }

# 2. COLMAP sparse reconstruction + undistortion (reference run_colmap.sh).
command -v colmap >/dev/null || {
  echo "colmap not on PATH; install it or run the docs/custom_capture.md steps on a COLMAP-equipped host" >&2
  exit 3; }
colmap feature_extractor \
  --database_path "$SCENE/database.db" --image_path "$SCENE/images_raw" \
  --ImageReader.camera_model SIMPLE_RADIAL --ImageReader.single_camera 1 \
  --SiftExtraction.use_gpu 0
colmap "$MATCHER" --database_path "$SCENE/database.db" --SiftMatching.use_gpu 0
mkdir -p "$SCENE/sparse"
colmap mapper \
  --database_path "$SCENE/database.db" --image_path "$SCENE/images_raw" \
  --output_path "$SCENE/sparse"
colmap image_undistorter \
  --image_path "$SCENE/images_raw" --input_path "$SCENE/sparse/0" \
  --output_path "$SCENE/dense" --output_type COLMAP

# 3. Sparse model -> transforms.json (in-tree converter; no pycolmap).
python scripts/convert_colmap_to_json.py \
  --sparse_dir "$SCENE/dense/sparse" --images_dir images \
  --scene_type "$SCENE_TYPE" --output "$SCENE/dense/transforms.json"

# 4. Generated config ready for train.py.
python scripts/generate_config.py \
  --sequence_name "$(basename "$SCENE")" --data_dir "$SCENE/dense" \
  --scene_type "$SCENE_TYPE" --output "configs/custom_$(basename "$SCENE").yaml"

echo "scene ready: $SCENE/dense/transforms.json"
echo "config:      configs/custom_$(basename "$SCENE").yaml"
