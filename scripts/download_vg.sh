#!/usr/bin/env bash
# Fetch Visual Genome (images + scene-graph JSONs) into datasets/vg, then
# preprocess to HDF5 with: python -m layout2img_tpu.cli.preprocess_vg --vg_dir datasets/vg
# Equivalent of reference scripts/download_vg.sh.
set -euo pipefail

VG_DIR=${1:-datasets/vg}
mkdir -p "$VG_DIR"
cd "$VG_DIR"

for f in images.zip images2.zip; do
  wget -c "https://cs.stanford.edu/people/rak248/VG_100K_2/$f"
  unzip -qn "$f"
done

for f in image_data.json.zip objects.json.zip relationships.json.zip \
         object_alias.txt relationship_alias.txt; do
  wget -c "https://visualgenome.org/static/data/dataset/$f" || \
  wget -c "http://visualgenome.org/static/data/dataset/$f"
  case "$f" in *.zip) unzip -qn "$f";; esac
done

echo "VG raw data ready under $VG_DIR; now run:"
echo "  python -m layout2img_tpu.cli.preprocess_vg --vg_dir $VG_DIR"
