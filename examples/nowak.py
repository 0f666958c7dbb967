"""Gaussian-input-noise robustness training (ref examples/nowak.py).

Forward on ``cat([x+ε, x])`` with ε ~ N(0, noise_std²); loss on the noisy
half, or on the clean half with ``--improved`` (ref nowak.py:149-158).
The backbone's BatchNorms are PartialBatchNorm (clean-half statistics shared
with the noisy half, psum'd across the mesh by XLA — ref nowak.py:13-33) and
ReLUs are partial_relu (noisy half reuses the clean half's activation mask,
ref nowak.py:36-48) via the ResNet ``norm="partial"`` knob.

Reference hparams: lr 5e-4, wd 0.05, clip 5.0, 100 epochs, bs 128
(ref nowak.py:209-214).
"""

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
            self.args.dataset, (200, 64)
        )
        ds = datasets.get_dataset(self.args.dataset_path, "train", name=self.args.dataset)
        return make_loader(ds, self.args.batch_size, train=True,
                           image_size=self.image_size, seed=self.args.seed)

    def initialize_val_loader(self):
        ds = datasets.get_dataset(self.args.dataset_path, "val", name=self.args.dataset)
        return make_loader(ds, self.args.batch_size, train=False,
                           image_size=self.image_size)

    def initialize_modules(self):
        self.model = create_model(
            self.args.architecture,
            num_classes=self.num_classes,
            image_size=self.image_size,
            norm="partial",
        )

    def compute_loss(self, params, model_state, batch, rng):
        k_aug, k_noise, k_bn = jax.random.split(rng, 3)
        x = augment_batch(k_aug, batch["image"], strength=self.args.strength, train=True)
        n = x.shape[0]
        eps = jax.random.normal(k_noise, x.shape) * self.args.noise_std
        both = jnp.concatenate([x + eps, x], axis=0)
        preds, updates = self.model.apply(
            {"params": params, **model_state}, both,
            deterministic=False, mutable=["batch_stats"],
        )
        labels = batch["label"]
        onehot = optax.smooth_labels(jax.nn.one_hot(labels, preds.shape[-1]), 0.1)
        half = preds[n:] if self.args.improved else preds[:n]
        loss = optax.softmax_cross_entropy(half.astype(jnp.float32), onehot).mean()
        acc = jnp.mean((jnp.argmax(half, -1) == labels).astype(jnp.float32))
        return loss, {"metrics": {"accuracy": acc}, "model_state": updates}

    def eval_step(self, params, model_state, batch):
        """(ref nowak.py:166-174: forwards cat([x, x]), scores the first half.)"""
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        both = jnp.concatenate([x, x], axis=0)
        preds = self.model.apply({"params": params, **model_state}, both)[: x.shape[0]]
        correct = jnp.sum((jnp.argmax(preds, -1) == batch["label"]).astype(jnp.float32))
        return {"accus": correct, "count": jnp.float32(x.shape[0])}


def build_parser():
    parser = argparse.ArgumentParser(description="Gaussian-noise training")
    parser.add_argument("--improved", action="store_true")
    parser.add_argument("--dataset", type=str, default="TinyImageNet")
    parser.add_argument("--strength", type=int, default=1, choices=[0, 1, 2, 3])
    parser.add_argument("--noise-std", type=float, default=0.1)
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    # reference hard-overrides (ref nowak.py:209-214)
    args.learning_rate = 5e-4
    args.weight_decay = 0.05
    args.grad_max_norm = 5.0
    Model(args)()
