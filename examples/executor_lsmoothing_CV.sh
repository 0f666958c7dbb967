#!/usr/bin/env bash
# Label-smoothing cross-validation on CIFAR100 (ref examples/
# executor_lsmoothing_CV.sh): ls in {0, 0.01, ..., 0.99} x arch at fixed
# lr/wd/bs, long training.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/lsmoothing_cv}
DATASET=${DATASET:-CIFAR100}
ARCHS=${ARCHS:-"resnet18 resnet50 resnet101"}
LS_GRID=${LS_GRID:-"0.0 0.01 0.05 0.1 0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9 0.95 0.99"}
EPOCHS=${EPOCHS:-4000}
BS=${BS:-256}
for arch in $ARCHS; do
  for ls in $LS_GRID; do
    python simpler_randomlabel.py \
      --dataset "$DATASET" --architecture "$arch" \
      --label-smoothing "$ls" \
      --batch-size "$BS" --learning-rate 0.001 --weight-decay 0.05 \
      --strength 3 --float16 true --epochs "$EPOCHS" \
      --folder "$FOLDER/$arch" --add-version
  done
done
