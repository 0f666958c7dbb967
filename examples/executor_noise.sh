#!/usr/bin/env bash
# Gaussian-noise robustness sweep (ref examples/executor.sh + nowak.py):
# noise_std x improved-loss grid.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/noise_sweep}
for std in 0.05 0.1 0.2 0.4; do
  for improved in "" "--improved"; do
    python nowak.py \
      --dataset TinyImageNet --architecture resnet18 \
      --noise-std "$std" $improved \
      --epochs "${EPOCHS:-100}" --batch-size 128 \
      --folder "$FOLDER/std${std}${improved:+_improved}" --add-version
  done
done
