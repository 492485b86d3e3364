#!/usr/bin/env bash
# COCO 2017 keypoint dataset fetch (reference: load_mscoco_dataset via
# tensorlayer file utils — SURVEY.md §2 "Dataset download").
# Usage: scripts/download_coco.sh [target_dir]   (default: data/coco)
set -euo pipefail

TARGET="${1:-data/coco}"
mkdir -p "$TARGET"
cd "$TARGET"

fetch() {
  local url="$1" out="$2"
  if [ ! -e "$out" ]; then
    echo "downloading $url"
    curl -fL --retry 3 -o "$out.tmp" "$url" && mv "$out.tmp" "$out"
  fi
}

fetch http://images.cocodataset.org/zips/train2017.zip train2017.zip
fetch http://images.cocodataset.org/zips/val2017.zip val2017.zip
fetch http://images.cocodataset.org/annotations/annotations_trainval2017.zip \
      annotations_trainval2017.zip

for z in train2017.zip val2017.zip annotations_trainval2017.zip; do
  unzip -n -q "$z"
done
echo "COCO 2017 ready under $TARGET"
