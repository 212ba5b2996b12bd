#!/usr/bin/env bash
# ARKitScenes download helper — like the reference
# (scripts/prep/download_arkitscenes.sh:22-37) this does NOT download
# automatically: ARKitScenes requires accepting Apple's license. It writes
# step-by-step instructions instead.
set -euo pipefail

OUT_DIR="${1:-data/raw/arkit}"
mkdir -p "$OUT_DIR"

cat > "$OUT_DIR/DOWNLOAD_INSTRUCTIONS.txt" <<'EOF'
ARKitScenes 3DOD download steps
===============================
1. Visit https://github.com/apple/ARKitScenes and accept the license terms.
2. Clone the repo and use its download script, e.g.:
     python download_data.py 3dod --video_id_csv threedod/3dod_train_val_splits.csv \
         --download_dir <this directory>
3. Expected layout per scene after download:
     <scene_id>/<scene_id>_3dod_annotation.json
     <scene_id>/lowres_wide/*.png
4. Then convert to training samples:
     python scripts/prep/prepare_arkit_from_3dod.py --root <this dir>/Training \
         --output data/processed/arkit_synth/train.json
EOF

echo "Wrote instructions to $OUT_DIR/DOWNLOAD_INSTRUCTIONS.txt"
echo "(ARKitScenes requires manual license acceptance; no automatic download.)"
