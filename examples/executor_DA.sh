#!/usr/bin/env bash
# Augmentation-strength sweep (ref examples/executor_DA.sh:13-20).
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/da_sweep}
for strength in 0 1 2 3; do
  python simpler_randomlabel.py \
    --dataset CIFAR100 --architecture resnet18 \
    --strength "$strength" --label-smoothing 0.1 \
    --epochs "${EPOCHS:-100}" --batch-size 256 \
    --folder "$FOLDER/strength${strength}" --add-version
done
