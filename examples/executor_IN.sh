#!/usr/bin/env bash
# Long-training DIET sweep across large datasets (ref examples/executor_IN.sh,
# active loop at the file tail): epochs x arch (per-arch lr/wd) x
# label-smoothing {0.1, 0.8} x wd-scaling {1.0, 1000.0} over
# ImageNet100 / INaturalist / ImageNet, via simpler_randomlabel.py, plus the
# --max-indices 300000 ImageNet cell.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/in_sweep}
EPOCHS_GRID=${EPOCHS_GRID:-"100 500 1000"}
ARCHS=${ARCHS:-"resnet18 resnet50 swin_t"}
LS_GRID=${LS_GRID:-"0.1 0.8"}
SCALING_GRID=${SCALING_GRID:-"1.0 1000.0"}
DATASETS=${DATASETS:-"ImageNet100 INaturalist ImageNet"}
BS=${BS:-128}
STRENGTH=${STRENGTH:-3}
for epochs in $EPOCHS_GRID; do
  for arch in $ARCHS; do
    # the reference gives transformers the lower lr / wd (executor_IN.sh)
    case "$arch" in
      swin_*|vit_*|*vit*) lr=0.0002; wd=0.01 ;;
      *) lr=0.001; wd=0.05 ;;
    esac
    for ls in $LS_GRID; do
      for scaling in $SCALING_GRID; do
        for dataset in $DATASETS; do
          extra=""
          if [ "$dataset" = "ImageNet" ]; then extra="--max-indices 300000"; fi
          python simpler_randomlabel.py \
            --dataset "$dataset" --projector-depth 0 \
            --label-smoothing "$ls" --wd-scaling "$scaling" \
            --architecture "$arch" --batch-size "$BS" \
            --learning-rate "$lr" --weight-decay "$wd" \
            --strength "$STRENGTH" --float16 true --eval-each-epoch true \
            --epochs "$epochs" \
            --folder "$FOLDER/$dataset" --add-version $extra
        done
      done
    done
  done
done
