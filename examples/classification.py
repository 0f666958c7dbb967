"""Supervised robust-vs-vanilla classification — the reference's flagship
experiment (ref examples/CIFAR100.py): train an architecture with/without
Sinkhorn attention under cutmix + label smoothing, AdamW, warmup+cosine,
and evaluate top-1 each epoch (optionally under Gaussian input noise — the
noisy-eval robustness curve).

TPU rewrite: data-parallel over the device mesh via the Trainer engine
(gradient reduction by XLA, not DDP), cutmix as a masked device op
(ref CIFAR100.py:119-127 did host RNG + index_copy churn), and the noise /
augmentation pipeline fused on device.

Usage:
  python examples/classification.py --architecture simple_vit --robust true \
      --dataset CIFAR100 --dataset-path /data/cifar --epochs 100
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from noise_robust_vit_tpu import datasets, ops
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import DataLoader, Trainer, make_config
from noise_robust_vit_tpu.train.data import augment_batch, make_loader


class Model(Trainer):
    """(ref CIFAR100.py:16-166 — the omega.Trainer subclass.)"""

    def initialize_train_loader(self):
        self.num_classes, self.image_size = datasets.NAME_TO_CLASS.get(
            self.args.dataset, (100, 32)
        )
        ds = datasets.get_dataset(self.args.dataset_path, "train", name=self.args.dataset)
        if hasattr(ds, "classes"):
            self.num_classes = len(ds.classes)
        return make_loader(
            ds, self.args.batch_size, train=True,
            image_size=self.image_size, seed=self.args.seed,
        )

    def initialize_val_loader(self):
        split = "test" if self.args.dataset.startswith("CIFAR") else "val"
        ds = datasets.get_dataset(self.args.dataset_path, split, name=self.args.dataset)
        return make_loader(
            ds, self.args.batch_size, train=False, image_size=self.image_size,
        )

    def initialize_modules(self):
        dtype = jnp.bfloat16 if self.args.float16 else jnp.float32
        self.model = create_model(
            self.args.architecture,
            num_classes=self.num_classes,
            image_size=self.image_size,
            robust=self.args.robust,
            dtype=dtype,
        )

    def compute_loss(self, params, model_state, batch, rng):
        """Cutmix + label-smoothed CE, mixed by realized box area
        (ref CIFAR100.py:119-141). Applies the model in TRAIN mode:
        ``deterministic=False`` (dropout/drop-path live), mutable
        ``batch_stats`` when the arch has BN — the reference trains
        BN-heavy levit/S60 through this script (ref CIFAR100.py:66-88)."""
        k_aug, k_mix, k_drop = jax.random.split(rng, 3)
        x = augment_batch(
            k_aug,
            batch["image"],
            strength=self.args.strength,
            train=True,
            noise_std=self.args.train_noise_std,
        )
        labels = batch["label"]
        ls = self.args.label_smoothing

        def ce(logits, y):
            onehot = jax.nn.one_hot(y, logits.shape[-1])
            if ls:
                onehot = optax.smooth_labels(onehot, ls)
            return optax.softmax_cross_entropy(logits, onehot)

        variables = {"params": params, **model_state}
        needs_bn = "batch_stats" in model_state

        def apply_train(inp):
            if needs_bn:
                logits, upd = self.model.apply(
                    variables, inp, deterministic=False,
                    mutable=["batch_stats"], rngs={"dropout": k_drop},
                )
                return logits, {**model_state, **dict(upd)}
            logits = self.model.apply(
                variables, inp, deterministic=False, rngs={"dropout": k_drop}
            )
            return logits, model_state

        if self.args.cutmix:
            x, (la, lb, lam) = ops.cutmix(k_mix, x, labels, beta=1.0)
            logits, new_state = apply_train(x)
            loss = lam * ce(logits, la) + (1 - lam) * ce(logits, lb)
            acc_labels = la
        else:
            logits, new_state = apply_train(x)
            loss = ce(logits, labels)
            acc_labels = labels
        acc = jnp.mean((jnp.argmax(logits, -1) == acc_labels).astype(jnp.float32))
        return loss.mean(), {"metrics": {"accuracy": acc}, "model_state": new_state}

    def eval_step(self, params, model_state, batch):
        """Top-1 under optional Gaussian eval noise (ref CIFAR100.py:148-156;
        the reduce-over-ranks is XLA's job here)."""
        x = augment_batch(
            jax.random.PRNGKey(0),
            batch["image"],
            train=False,
            noise_std=self.args.eval_noise_std,
        )
        logits = self.model.apply({"params": params, **model_state}, x)
        correct = jnp.sum((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return {"accus": correct, "count": jnp.float32(logits.shape[0])}


def build_parser():
    parser = argparse.ArgumentParser(description="supervised classification")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--robust", type=lambda v: str(v).lower() in ("1", "true"), default=False)
    parser.add_argument("--strength", type=int, default=0, choices=[0, 1, 2, 3])
    parser.add_argument("--cutmix", type=lambda v: str(v).lower() in ("1", "true"), default=True)
    parser.add_argument("--train-noise-std", type=float, default=0.0)
    parser.add_argument("--eval-noise-std", type=float, default=0.0)
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    model = Model(args)
    model()
