#!/usr/bin/env bash
# Grouped-label (k-means cluster targets) training at scale (ref examples/
# executor_grouped.sh): build the grouping npz if absent, then DIET-train
# convnets (lr 1e-3/wd 0.05) and transformers (lr 2e-4/wd 0.01) against the
# cluster indices with label-smoothing 0.8 and sync BN.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/grouped}
DATASET=${DATASET:-ImageNet}
# ${VAR-default} (no colon): an explicitly EMPTY list stays empty
CONV_ARCHS=${CONV_ARCHS-"resnet18 resnet50"}
VIT_ARCHS=${VIT_ARCHS-"swin_s vit_b_16"}
EPOCHS=${EPOCHS:-2000}
BS=${BS:-512}
CLUSTERS=${CLUSTERS:-10000}
PROJ_DIM=${PROJ_DIM:-4096}
# build_grouping writes randomproj_{proj_dim}_grouped_{k}.npz under --output
INDICES=${INDICES:-"$FOLDER/grouping/randomproj_${PROJ_DIM}_grouped_${CLUSTERS}.npz"}
if [ ! -f "$INDICES" ]; then
  mkdir -p "$(dirname "$INDICES")"
  python build_grouping.py \
    --dataset "$DATASET" --clusters "$CLUSTERS" --proj-dim "$PROJ_DIM" \
    --output "$(dirname "$INDICES")"
fi
run() {
  python simpler_randomlabel.py \
    --dataset "$DATASET" --architecture "$1" \
    --indices-from "$INDICES" --sync-batchnorm true --label-smoothing 0.8 \
    --batch-size "$BS" --learning-rate "$2" --weight-decay "$3" \
    --strength 3 --float16 true --epochs "$EPOCHS" --save-final-model true \
    --folder "$FOLDER" --add-version
}
for arch in $CONV_ARCHS; do run "$arch" 0.001 0.05; done
for arch in $VIT_ARCHS; do run "$arch" 0.0002 0.01; done
