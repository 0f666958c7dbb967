#!/usr/bin/env bash
# Robust-vs-vanilla sweep on CIFAR-100 (ref examples/executor_CIFAR.sh):
# arch x robust x lr grid, one run folder per config (--add-version).
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/cifar_sweep}
EPOCHS=${EPOCHS:-100}
for arch in simple_vit swin_t levit S60; do
  for robust in false true; do
    for lr in 2e-4 5e-4; do
      python classification.py \
        --dataset CIFAR100 \
        --architecture "$arch" --robust "$robust" \
        --learning-rate "$lr" --weight-decay 0.05 --grad-max-norm 5.0 \
        --batch-size 512 --epochs "$EPOCHS" --label-smoothing 0.1 \
        --folder "$FOLDER/${arch}_robust${robust}_lr${lr}" --add-version
    done
  done
done
