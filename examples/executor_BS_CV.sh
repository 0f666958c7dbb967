#!/usr/bin/env bash
# Batch-size cross-validation with linear lr scaling on TinyImageNet
# (ref examples/executor_BS_CV.sh): bs in {8..2048}, lr scaled by bs/256,
# label-smoothing 0.8, sync BN, long training.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/bs_cv}
DATASET=${DATASET:-TinyImageNet}
ARCH=${ARCH:-resnet18}
BS_GRID=${BS_GRID:-"8 16 32 64 128 256 512 1024 2048"}
EPOCHS=${EPOCHS:-2000}
BASE_LR=${BASE_LR:-0.001}
BASE_BS=256
for bs in $BS_GRID; do
  slr=$(python -c "print($BASE_LR * $bs / $BASE_BS)")
  python simpler_randomlabel.py \
    --dataset "$DATASET" --architecture "$ARCH" \
    --label-smoothing 0.8 --sync-batchnorm true \
    --batch-size "$bs" --learning-rate "$slr" --weight-decay 0.05 \
    --strength 3 --float16 true --epochs "$EPOCHS" \
    --folder "$FOLDER" --add-version
done
