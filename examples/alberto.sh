#!/usr/bin/env bash
# Trivial local launcher for the VICReg toy experiments
# (ref examples/alberto.sh: model x augmentation x lambda grid, fresh folder
# per cell). Our alberto.py consolidates the reference's --augmentation into
# --strength and --lamb into --temperature.
set -e
cd "$(dirname "$0")"
BASE=${FOLDER:-./runs/ALBERTO}
EPOCHS=${EPOCHS:-100}
for model in cnn mlp; do
  for strength in 1; do
    for lamb in 10.0; do
      folder="$BASE/$model/$strength/$lamb"
      rm -rf "$folder"
      python alberto.py --folder "$folder" --epochs "$EPOCHS" \
        --strength "$strength" --temperature "$lamb" \
        --embedding-dim 256 --learning-rate 0.001 --model "$model"
    done
  done
done
