#!/usr/bin/env bash
# Ensemble-distillation sweep (ref examples/executor_many.sh →
# many_to_ffcv_dataset.py, rebuilt as ensemble_probe.py): probe trained
# against the averaged predictions of {4, 8, 16} ensemble members.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/many}
DATASET=${DATASET:-ImageNet}
ARCH=${ARCH:-resnet18}
EPOCHS=${EPOCHS:-30}
BS=${BS:-1024}
SIZES=${SIZES:-"4 8 16"}
# glob of member checkpoints; empty uses ensemble_probe's synthetic members
CKPT_GLOB=${CKPT_GLOB:-""}
for n in $SIZES; do
  ckpts=""
  if [ -n "$CKPT_GLOB" ]; then
    # shellcheck disable=SC2086
    ckpts="--checkpoints $(ls $CKPT_GLOB 2>/dev/null | head -n "$n" | tr '\n' ' ')"
  fi
  # shellcheck disable=SC2086
  python ensemble_probe.py \
    --dataset "$DATASET" --architecture "$ARCH" --max-num-models "$n" \
    --label-smoothing 0.1 --eval-each-epoch true \
    --batch-size "$BS" --learning-rate 0.002 --weight-decay 0.0001 \
    --strength 3 --float16 true --epochs "$EPOCHS" \
    --folder "$FOLDER" --add-version $ckpts
done
