#!/usr/bin/env bash
# Nested DIET sweep over datasets x strength x lr x smoothing
# (ref examples/executor_SMALL_DATASETS.sh:10-28).
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/small_datasets}
for dataset in CIFAR10 CIFAR100 TinyImageNet OxfordIIITPet FGVCAircraft; do
  for strength in 0 3; do
    for lr in 1e-3 5e-4; do
      for smoothing in 0.0 0.1; do
        python randomlabel.py \
          --dataset "$dataset" --architecture resnet18 --loss ce \
          --strength "$strength" --learning-rate "$lr" \
          --label-smoothing "$smoothing" \
          --epochs "${EPOCHS:-100}" --batch-size 256 \
          --checkpoint-frequency 25 --save-final-model true \
          --folder "$FOLDER/${dataset}_s${strength}_lr${lr}_ls${smoothing}" \
          --add-version
      done
    done
  done
done
