"""Ensemble probe — concatenate frozen features of N checkpoints and train a
joint linear classifier (ref examples/many_to_ffcv_dataset.py:60-96)."""

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
from noise_robust_vit_tpu.train import (
    make_loader,
    Trainer,
    make_config,
    restore_checkpoint,
)
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
        self.backbone = create_model(
            self.args.architecture, num_classes=self.num_classes,
            image_size=self.image_size,
        )
        self.model = self.backbone

    def init_params(self, sample_batch):
        x = jnp.asarray(sample_batch["image"], jnp.float32)
        k1, k2 = jax.random.split(self.next_rng())
        base = self.backbone.init(k1, x)
        cap = self.args.max_num_models
        self.member_variables = []
        for ckpt in (self.args.checkpoints or [])[:cap]:
            restored = restore_checkpoint(ckpt, base)
            self.member_variables.append(restored if restored is not None else base)
        if not self.member_variables:
            # no checkpoints: N independently-initialized members stand in for
            # the reference's pretrained model glob (ref :60-70 truncates the
            # glob at --max-num-models)
            self.member_variables = [
                self.backbone.init(k, x)
                for k in jax.random.split(k1, max(1, cap))
            ]
        feats = jnp.concatenate(
            [
                self.backbone.apply(v, x, return_features=True)
                for v in self.member_variables
            ],
            axis=-1,
        )
        self.classifier = nn.Dense(self.num_classes)
        return self.classifier.init(k2, feats)

    def _ensemble_feats(self, x):
        return jax.lax.stop_gradient(
            jnp.concatenate(
                [
                    self.backbone.apply(v, x, return_features=True)
                    for v in self.member_variables
                ],
                axis=-1,
            )
        )

    def compute_loss(self, params, model_state, batch, rng):
        x = augment_batch(rng, batch["image"], strength=self.args.strength, train=True)
        feats = self._ensemble_feats(x)
        logits = self.classifier.apply({"params": params}, feats)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), batch["label"]
        ).mean()
        return loss, {"metrics": {}}

    def eval_step(self, params, model_state, batch):
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        logits = self.classifier.apply({"params": params}, self._ensemble_feats(x))
        correct = jnp.sum((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return {"accus": correct, "count": jnp.float32(logits.shape[0])}


def build_parser():
    parser = argparse.ArgumentParser(description="ensemble linear probe")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--checkpoints", type=Path, nargs="*", default=None)
    parser.add_argument("--max-num-models", type=int, default=1,
                        help="cap on ensemble size (ref many_to_ffcv_dataset)")
    parser.add_argument("--strength", type=int, default=0, choices=[0, 1, 2, 3])
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    Model(args)()
