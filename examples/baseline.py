"""Supervised baselines across datasets and architectures
(ref examples/baseline.py): build any registered architecture with a fresh
head (the reference's ``torchvision.models.__dict__[arch]()`` + new fc,
ref baseline.py:60-64) and train with the standard recipe; the dataset path
registry (ref baseline.py:102-123) is ``datasets.NAME_TO_CLASS``."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import make_loader, Trainer, make_config
from noise_robust_vit_tpu.train.data import augment_batch


class Model(Trainer):
    def initialize_train_loader(self):
        self.num_classes, self.image_size = datasets.NAME_TO_CLASS.get(
            self.args.dataset, (100, 32)
        )
        ds = datasets.get_dataset(self.args.dataset_path, "train", name=self.args.dataset)
        return make_loader(ds, self.args.batch_size, train=True,
                           image_size=self.image_size, seed=self.args.seed)

    def initialize_val_loader(self):
        split = "test" if self.args.dataset.startswith("CIFAR") else "val"
        ds = datasets.get_dataset(self.args.dataset_path, split, name=self.args.dataset)
        return make_loader(ds, self.args.batch_size, train=False,
                           image_size=self.image_size)

    def initialize_modules(self):
        self.model = create_model(
            self.args.architecture, num_classes=self.num_classes,
            image_size=self.image_size,
        )

    def compute_loss(self, params, model_state, batch, rng):
        x = augment_batch(rng, batch["image"], strength=self.args.strength, train=True)
        variables = {"params": params, **model_state}
        needs_bn = any("batch_stats" in c for c in model_state)
        if needs_bn:
            logits, upd = self.model.apply(
                variables, x, deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
        else:
            logits = self.model.apply(
                variables, x, deterministic=False, rngs={"dropout": rng}
            )
            upd = model_state
        onehot = optax.smooth_labels(
            jax.nn.one_hot(batch["label"], logits.shape[-1]),
            self.args.label_smoothing,
        )
        loss = optax.softmax_cross_entropy(logits.astype(jnp.float32), onehot).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return loss, {"metrics": {"accuracy": acc}, "model_state": upd}

    def eval_step(self, params, model_state, batch):
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        logits = self.model.apply({"params": params, **model_state}, x)
        correct = jnp.sum((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return {"accus": correct, "count": jnp.float32(logits.shape[0])}


def build_parser():
    parser = argparse.ArgumentParser(description="supervised baselines")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--strength", type=int, default=1, choices=[0, 1, 2, 3])
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    Model(args)()
