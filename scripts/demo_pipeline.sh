#!/bin/bash
# Demo pipeline (reference scripts/demo_pipeline.sh): parse a scanned capture,
# run keypoint-free SfM on the annotate sequence, then run the tracking demo
# on the test sequence.
set -e
PROJECT_DIR="$(pwd)"
OBJ_NAME=$1
if [ -z "$OBJ_NAME" ]; then echo "usage: $0 <object-name>"; exit 1; fi
echo "Current work dir: $PROJECT_DIR"

echo '-------------------'
echo 'Parse scanned data:'
echo '-------------------'
python "$PROJECT_DIR/parse_scanned_data.py" \
    --scanned_object_path "$PROJECT_DIR/data/demo/$OBJ_NAME"

echo '--------------------------------------------------------------'
echo 'Run Keypoint-Free SfM to reconstruct the object point cloud:'
echo '--------------------------------------------------------------'
python "$PROJECT_DIR/run.py" \
    +preprocess=sfm_demo \
    dataset.data_dir="$PROJECT_DIR/data/demo" \
    dataset.outputs_dir="$PROJECT_DIR/data/demo/sfm_model"

echo '-----------------------------------'
echo 'Run inference and output demo video:'
echo '-----------------------------------'
python "$PROJECT_DIR/demo.py" \
    +experiment=inference_demo \
    dataset.data_dir="$PROJECT_DIR/data/demo" \
    dataset.sfm_outputs_dir="$PROJECT_DIR/data/demo/sfm_model"
