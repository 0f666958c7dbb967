"""Supervised-pairs VICReg-style SSL (ref examples/sup_ssl.py).

Loss (ref sup_ssl.py:105-124): variance-covariance regularization
``mean((cov(Zᵀ) − I)²)`` on projected features plus an invariance term over
SAME-LABEL sample pairs, weighted by ``--temperature``; a detached online
linear probe tracks class accuracy. The reference's dynamic
``G.nonzero`` pair gathering becomes a masked mean (static shapes for XLA).
MultiStepLR(0.5, 0.75 epochs, γ=0.1) for runs ≤100 epochs
(ref sup_ssl.py:148-157).
"""

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
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import make_loader, Trainer, make_config, multistep
from noise_robust_vit_tpu.train.data import augment_batch
from noise_robust_vit_tpu.train.optim import adamw


def vicreg_sup_loss(z, labels, temperature: float):
    """(ref sup_ssl.py:115-123.)"""
    z = z.astype(jnp.float32)
    n, d = z.shape
    mu = jnp.mean(z, axis=0, keepdims=True)
    zc = z - mu
    cov = zc.T @ zc / (n - 1)
    vc_loss = jnp.mean((cov - jnp.eye(d)) ** 2)
    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    sq = jnp.sum((z[:, None, :] - z[None, :, :]) ** 2, axis=-1)  # [N, N]
    inv_loss = jnp.sum(same * sq) / (jnp.maximum(jnp.sum(same), 1.0) * d)
    return vc_loss + temperature * inv_loss


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
        self.backbone = create_model(
            self.args.architecture,
            num_classes=self.num_classes,
            image_size=self.image_size,
        )
        self.model = self.backbone

    def initialize_optimizer(self, total_steps):
        if self.args.epochs > 100:
            return super().initialize_optimizer(total_steps)
        steps = total_steps // self.args.epochs
        sched = multistep(
            self.args.learning_rate,
            [int(self.args.epochs * 0.5) * steps, int(self.args.epochs * 0.75) * steps],
            gamma=0.1,
        )
        return adamw(sched, weight_decay=self.args.weight_decay,
                     grad_max_norm=self.args.grad_max_norm)

    def init_params(self, sample_batch):
        x = jnp.asarray(sample_batch["image"], jnp.float32)
        k1, k2, k3 = jax.random.split(self.next_rng(), 3)
        bb = self.backbone.init(k1, x)
        feats = self.backbone.apply(bb, x, return_features=True)
        fan_in = feats.shape[-1]
        self.projector = nn.Dense(self.num_classes)
        self.classifier = nn.Dense(self.num_classes)
        pj = self.projector.init(k2, feats)
        cl = self.classifier.init(k3, feats)
        variables = {}
        for col in set(bb) | set(pj) | set(cl):
            variables[col] = {
                "backbone": dict(bb.get(col, {})),
                "projector": dict(pj.get(col, {})),
                "classifier": dict(cl.get(col, {})),
            }
        return variables

    def _feats(self, params, model_state, x, train, rng=None):
        bb_state = {c: s["backbone"] for c, s in model_state.items()}
        if train:
            return self.backbone.apply(
                {"params": params["backbone"], **bb_state}, x,
                deterministic=False, return_features=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
        return (
            self.backbone.apply(
                {"params": params["backbone"], **bb_state}, x, return_features=True
            ),
            None,
        )

    def compute_loss(self, params, model_state, batch, rng):
        k_aug, k_drop = jax.random.split(rng)
        x = augment_batch(k_aug, batch["image"], strength=self.args.strength, train=True)
        labels = batch["label"]
        feats, bb_upd = self._feats(params, model_state, x, True, k_drop)
        probe = self.classifier.apply(
            {"params": params["classifier"]}, jax.lax.stop_gradient(feats)
        )
        true_loss = optax.softmax_cross_entropy_with_integer_labels(
            probe.astype(jnp.float32), labels
        ).mean()
        z = self.projector.apply({"params": params["projector"]}, feats)
        other = vicreg_sup_loss(z, labels, self.args.temperature)
        new_state = {
            col: {**s, "backbone": bb_upd.get(col, s["backbone"])}
            for col, s in model_state.items()
        } if bb_upd else model_state
        return other + true_loss, {
            "metrics": {"ssl_loss": other, "probe_loss": true_loss},
            "model_state": new_state,
        }

    def eval_step(self, params, model_state, batch):
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        feats, _ = self._feats(params, model_state, x, False)
        probe = self.classifier.apply({"params": params["classifier"]}, feats)
        y = batch["label"]
        top1 = jnp.sum((jnp.argmax(probe, -1) == y).astype(jnp.float32))
        k = min(5, probe.shape[-1])
        _, t5 = jax.lax.top_k(probe, k)
        top5 = jnp.sum(jnp.any(t5 == y[:, None], -1).astype(jnp.float32))
        return {"accus": top1, "accus5": top5, "count": jnp.float32(y.shape[0])}


def build_parser():
    parser = argparse.ArgumentParser(description="supervised VICReg SSL")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--strength", type=int, default=0, choices=[0, 1, 2, 3])
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    Model(args)()
