"""The reference's flagship supervised experiment entry point
(ref examples/CIFAR100.py — which, despite the name, trains robust-vs-vanilla
swin_t/levit/S60 on ImageFolder data with cutmix; ref CIFAR100.py:66-88,
:119-141). Implementation lives in classification.py; this entry point keeps
the reference's name and hard-coded hparams (ref CIFAR100.py:191-198:
wd 0.05, clip 5.0, 100 epochs, bs 512)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from classification import Model, build_parser  # noqa: F401
from noise_robust_vit_tpu.train import make_config

if __name__ == "__main__":
    args = make_config(build_parser())
    # reference hard-overrides (ref CIFAR100.py:191-198)
    args.weight_decay = 0.05
    args.grad_max_norm = 5.0
    args.label_smoothing = 0.1
    Model(args)()
