"""Noisy-eval robustness curve (BASELINE.json config 2): evaluate a model's
top-1 under a sweep of Gaussian input-noise standard deviations — the
robust-vs-vanilla comparison the fork exists for. Noise is injected in the
fused device-side pipeline (``augment_batch(noise_std=...)``,
ref examples/nowak.py:153 semantics) with deterministic keys.

Prints one JSON line per noise level and writes ``noisy_eval.jsonl`` to the
run folder.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import make_loader, RunLogger, restore_checkpoint
from noise_robust_vit_tpu.train.data import augment_batch


def main(args):
    num_classes, image_size = datasets.NAME_TO_CLASS.get(args.dataset, (100, 32))
    model = create_model(
        args.architecture, num_classes=num_classes, image_size=image_size,
        robust=args.robust,
    )
    split = "test" if args.dataset.startswith("CIFAR") else "val"
    ds = datasets.get_dataset(args.dataset_path, split, name=args.dataset)
    loader = make_loader(ds, args.batch_size, train=False,
                         image_size=image_size)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
    )
    if args.checkpoint is not None:
        restored = restore_checkpoint(args.checkpoint, variables)
        if restored is not None:
            variables = restored

    @jax.jit
    def predict(images, key, noise_std):
        x = augment_batch(key, images, train=False)
        if True:  # noise after normalization (ref nowak.py:153)
            x = x + jax.random.normal(key, x.shape) * noise_std
        return jnp.argmax(model.apply(variables, x), axis=-1)

    logger = RunLogger(args.folder) if args.folder else None
    results = []
    for noise_std in args.noise_stds:
        correct = total = 0
        for i, batch in enumerate(loader):
            preds = predict(
                jnp.asarray(batch["image"]),
                jax.random.fold_in(jax.random.PRNGKey(args.seed), i),
                noise_std,
            )
            correct += int(np.sum(np.asarray(preds) == batch["label"]))
            total += len(batch["label"])
        row = {"noise_std": noise_std, "top1": correct / total,
               "robust": args.robust, "architecture": args.architecture}
        results.append(row)
        print(json.dumps(row))
        if logger:
            logger.log_txt("noisy_eval", **row)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Gaussian-noise eval sweep")
    parser.add_argument("--architecture", type=str, default="simple_vit_b16")
    parser.add_argument("--robust", type=lambda v: str(v).lower() in ("1", "true"),
                        default=False)
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--dataset-path", type=Path, default=None)
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--noise-stds", type=float, nargs="+",
                        default=[0.0, 0.1, 0.2, 0.4, 0.8])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--folder", type=Path, default=None)
    from noise_robust_vit_tpu.train.config import honor_platform_env

    honor_platform_env()
    main(parser.parse_args())
