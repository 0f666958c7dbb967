#!/usr/bin/env bash
# Architecture sweep at per-family lr/wd (ref examples/executor.sh:13-24):
# convnets at lr 1e-3 / wd 0.05, transformers at lr 2e-4 / wd 0.01, all at
# label-smoothing 0.8, bs 256, strength 3, long supervised training via
# simpler_randomlabel.py in supervised mode. Read results with
# `python reader.py --preset arch`.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/arch_sweep}
EPOCHS=${EPOCHS:-7000}
STRENGTH=${STRENGTH:-3}
BS=${BS:-256}
DATASET=${DATASET:-ImageNet100}
# reference families: 9 convnets then 4 transformers (executor.sh:13-24);
# defaults trimmed to the registered zoo, env-overridable. Unset-only
# defaults (`-`, not `:-`) so CONV_ARCHS="" means "no convnets", matching
# executor_grouped.sh — a `:-` here silently re-adds the default family
CONV_ARCHS=${CONV_ARCHS-"resnet18 resnet34 resnet50 resnet101"}
TRANS_ARCHS=${TRANS_ARCHS-"swin_t swin_s vit_b_16"}

run_arch () {
  arch=$1; lr=$2; wd=$3
  python simpler_randomlabel.py \
    --supervised --dataset "$DATASET" \
    --label-smoothing 0.8 --architecture "$arch" \
    --batch-size "$BS" --learning-rate "$lr" --weight-decay "$wd" \
    --strength "$STRENGTH" --float16 true --sync-batchnorm true \
    --epochs "$EPOCHS" --save-final-model true \
    --process-name "TINY$arch" \
    --folder "$FOLDER" --add-version
}

for arch in $CONV_ARCHS; do
  run_arch "$arch" 0.001 0.05
done
for arch in $TRANS_ARCHS; do
  run_arch "$arch" 0.0002 0.01
done
