#!/usr/bin/env bash
# Epoch-budget cross-validation on CIFAR100 (ref examples/
# executor_epochs_CV.sh): very long DIET training (up to 10k epochs) at
# label-smoothing 0.8, fixed lr/wd/bs, per-arch run folders.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/epochs_cv}
DATASET=${DATASET:-CIFAR100}
ARCHS=${ARCHS:-"resnet101"}
EPOCHS_GRID=${EPOCHS_GRID:-"10000"}
BS=${BS:-256}
for arch in $ARCHS; do
  for epochs in $EPOCHS_GRID; do
    python simpler_randomlabel.py \
      --dataset "$DATASET" --architecture "$arch" \
      --label-smoothing 0.8 --sync-batchnorm true \
      --batch-size "$BS" --learning-rate 0.001 --weight-decay 0.05 \
      --strength 3 --float16 true --epochs "$epochs" \
      --folder "$FOLDER/$arch/$epochs" --add-version
  done
done
