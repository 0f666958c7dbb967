#!/usr/bin/env bash
# Supervised-vs-SSL temperature sweep on CIFAR10 (ref examples/
# executor_sup_ssl.sh): VICReg-style sup_ssl.py over temperature
# {0.01, 0.1, 1, 10, 100} at fixed lr/wd, bs 1024.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/sup_ssl}
DATASET=${DATASET:-CIFAR10}
ARCH=${ARCH:-resnet18}
EPOCHS=${EPOCHS:-200}
BS=${BS:-1024}
TEMPS=${TEMPS:-"0.01 0.1 1 10 100"}
for temperature in $TEMPS; do
  python sup_ssl.py \
    --dataset "$DATASET" --architecture "$ARCH" \
    --temperature "$temperature" --eval-each-epoch true \
    --batch-size "$BS" --learning-rate 0.001 --weight-decay 0.001 \
    --strength 1 --float16 true --epochs "$EPOCHS" \
    --folder "$FOLDER/$DATASET" --add-version
done
