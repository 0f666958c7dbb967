#!/usr/bin/env bash
# Random hyperparameter search over the randomlabel losses
# (ref examples/executor_baseline.sh): N random draws over projector
# depth/width, batch size, lr, flip proba, label smoothing, loss
# {ce, sce, sboot}, bootstrap beta, optimizer {adam, adamw}, weight decay.
set -e
cd "$(dirname "$0")"
FOLDER=${FOLDER:-./runs/baseline_search}
EPOCHS=${EPOCHS:-400}
DRAWS=${DRAWS:-100}
ARCH=${ARCH:-resnet18}
DATASET=${DATASET:-CIFAR100}
SEED=${SEED:-$RANDOM}
depths=(0 1 2)
batchs=(256 512 1024)
lrs=(0.0002 0.0005 0.001 0.002)
widths=(512 2048 3096 4096 8192)
probas=(0.0 0.01 0.05)
smoothings=(0.0 0.01 0.1 0.2 0.3)
losss=(ce sce sboot)
betas=(0.99 0.95 0.9 0.7 0.5)
optimizers=(adam adamw)
wds=(0.0 0.001 0.01 0.05 0.1)
RANDOM=$SEED
for i in $(seq 1 "$DRAWS"); do
  depth=${depths[RANDOM % 3]}
  batch=${batchs[RANDOM % 3]}
  lr=${lrs[RANDOM % 4]}
  width=${widths[RANDOM % 5]}
  proba=${probas[RANDOM % 3]}
  smoothing=${smoothings[RANDOM % 5]}
  loss=${losss[RANDOM % 3]}
  beta=${betas[RANDOM % 5]}
  optimizer=${optimizers[RANDOM % 2]}
  wd=${wds[RANDOM % 5]}
  echo "width:$width, proba:$proba, loss:$loss, smoothing:$smoothing, optimizer:$optimizer, decay:$wd"
  python randomlabel.py \
    --dataset "$DATASET" --architecture "$ARCH" \
    --projector-depth "$depth" --projector-width "$width" \
    --proba "$proba" --loss "$loss" --beta "$beta" \
    --label-smoothing "$smoothing" --optimizer "$optimizer" \
    --weight-decay "$wd" --batch-size "$batch" --learning-rate "$lr" \
    --strength 3 --float16 true --epochs "$EPOCHS" \
    --folder "$FOLDER/search" --add-version
done
