"""Local (non-SLURM) VICReg toy experiments on positive pairs
(ref examples/alberto.py): two augmented views per sample, small CNN/MLP
encoders, variance-covariance + invariance loss (ref alberto.py:27-38),
detached linear probe; runs standalone on one chip."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.train import make_loader, Trainer, make_config
from noise_robust_vit_tpu.train.data import augment_batch


def vicreg(preds):
    """(ref alberto.py:27-38): batch is two stacked views; invariance between
    the halves, variance-covariance toward identity."""
    n, d = preds.shape
    m = preds.mean(axis=0)
    cov = (preds - m).T @ (preds - m) / n
    vc = jnp.mean((cov - jnp.eye(d)) ** 2)
    inv = jnp.mean((preds[: n // 2] - preds[n // 2 :]) ** 2)
    return vc, inv


class SmallCNN(nn.Module):
    embedding_dim: int = 128

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        for i, ch in enumerate((32, 64, 128)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.embedding_dim, name="proj")(x)


class SmallMLP(nn.Module):
    embedding_dim: int = 128

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.embedding_dim, name="fc2")(x)


class Model(Trainer):
    def initialize_train_loader(self):
        self.num_classes, self.image_size = datasets.NAME_TO_CLASS.get(
            self.args.dataset, (10, 32)
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
        net = SmallCNN if self.args.model == "cnn" else SmallMLP
        self.backbone = net(embedding_dim=self.args.embedding_dim)
        self.model = self.backbone

    def init_params(self, sample_batch):
        x = jnp.asarray(sample_batch["image"], jnp.float32)
        k1, k2 = jax.random.split(self.next_rng())
        bb = self.backbone.init(k1, x)
        emb = self.backbone.apply(bb, x)
        self.classifier = nn.Dense(self.num_classes)
        cl = self.classifier.init(k2, emb)
        return {"params": {"backbone": bb["params"], "classifier": cl["params"]}}

    def compute_loss(self, params, model_state, batch, rng):
        k1, k2 = jax.random.split(rng)
        # positive pair = two independent augmentations (ref alberto.py:41-51)
        v1 = augment_batch(k1, batch["image"], strength=self.args.strength, train=True)
        v2 = augment_batch(k2, batch["image"], strength=self.args.strength, train=True)
        both = jnp.concatenate([v1, v2], axis=0)
        emb = self.backbone.apply({"params": params["backbone"]}, both)
        vc, inv = vicreg(emb.astype(jnp.float32))
        probe = self.classifier.apply(
            {"params": params["classifier"]},
            jax.lax.stop_gradient(emb[: v1.shape[0]]),
        )
        probe_loss = optax.softmax_cross_entropy_with_integer_labels(
            probe.astype(jnp.float32), batch["label"]
        ).mean()
        loss = vc + self.args.temperature * inv + probe_loss
        return loss, {"metrics": {"vc": vc, "inv": inv, "probe": probe_loss}}

    def eval_step(self, params, model_state, batch):
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        emb = self.backbone.apply({"params": params["backbone"]}, x)
        probe = self.classifier.apply({"params": params["classifier"]}, emb)
        y = batch["label"]
        return {
            "accus": jnp.sum((jnp.argmax(probe, -1) == y).astype(jnp.float32)),
            "count": jnp.float32(y.shape[0]),
        }


def build_parser():
    parser = argparse.ArgumentParser(description="local VICReg toy")
    parser.add_argument("--dataset", type=str, default="CIFAR10")
    parser.add_argument("--model", type=str, default="cnn", choices=["cnn", "mlp"])
    parser.add_argument("--embedding-dim", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--strength", type=int, default=1, choices=[0, 1, 2, 3])
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    Model(args)()
