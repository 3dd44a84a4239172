#!/usr/bin/env bash
# Stitch drawn detection frames into a video (ref tools/images_to_video.sh).
# Usage: images_to_video.sh <glob-of-pngs> <out.mp4> [framerate]
set -euo pipefail
GLOB="${1:?usage: images_to_video.sh '<glob>' <out.mp4> [framerate]}"
OUT="${2:?usage: images_to_video.sh '<glob>' <out.mp4> [framerate]}"
RATE="${3:-10}"
ffmpeg -framerate "$RATE" -pattern_type glob -i "$GLOB" \
  -c:v libx264 -pix_fmt yuv420p "$OUT"
