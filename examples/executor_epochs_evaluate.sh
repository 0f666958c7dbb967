#!/usr/bin/env bash
# Transfer evaluation of pretrained checkpoints on fine-grained datasets
# (ref examples/executor_epochs_evaluate.sh): for each downstream dataset,
# linear-probe/finetune each listed checkpoint via evaluation.py.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/epochs_evaluate}
ARCH=${ARCH:-resnet50}
EPOCHS=${EPOCHS:-100}
DATASETS=${DATASETS:-"StanfordCars Food101 Flowers102 CUB_200_2011 FGVCAircraft DTD OxfordIIITPet"}
# space-separated checkpoint list; empty entries train the probe from the
# randomly-initialized backbone (the runnable-anywhere fallback)
CHECKPOINTS=${CHECKPOINTS:-""}
for name in $DATASETS; do
  if [ -n "$CHECKPOINTS" ]; then
    for ckpt in $CHECKPOINTS; do
      python evaluation.py \
        --dataset "$name" --architecture "$ARCH" --checkpoint "$ckpt" \
        --batch-size 256 --learning-rate 0.001 --weight-decay 0.00001 \
        --strength 3 --float16 true --epochs "$EPOCHS" \
        --folder "$FOLDER/$ARCH/$name" --add-version
    done
  else
    python evaluation.py \
      --dataset "$name" --architecture "$ARCH" \
      --batch-size 256 --learning-rate 0.001 --weight-decay 0.00001 \
      --strength 3 --float16 true --epochs "$EPOCHS" \
      --folder "$FOLDER/$ARCH/$name" --add-version
  fi
done
