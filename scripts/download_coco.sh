#!/usr/bin/env bash
# Fetch COCO 2017 (+ COCO-Stuff annotations) into datasets/coco.
# Equivalent of reference scripts/download_coco.sh; same directory layout the
# training CLI defaults expect.
set -euo pipefail

COCO_DIR=${1:-datasets/coco}
mkdir -p "$COCO_DIR/images" "$COCO_DIR/annotations"
cd "$COCO_DIR"

for f in train2017.zip val2017.zip; do
  wget -c "http://images.cocodataset.org/zips/$f"
  unzip -qn "$f" -d images/
done

wget -c http://images.cocodataset.org/annotations/annotations_trainval2017.zip
unzip -qn annotations_trainval2017.zip

wget -c http://images.cocodataset.org/annotations/stuff_annotations_trainval2017.zip
unzip -qn stuff_annotations_trainval2017.zip

echo "COCO ready under $COCO_DIR"
