"""Frozen-checkpoint linear + MLP probe transfer evaluation
(ref examples/evaluation.py).

Loads a trained checkpoint, freezes the backbone, and trains a linear probe
and a 2-layer MLP probe JOINTLY on the frozen features
(ref evaluation.py:140-160), reporting top-1/top-5 for both
(ref evaluation.py:162-186). Head stripping per arch family
(ref evaluation.py:98-134) is unnecessary here — every model exposes
``return_features=True``.
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
from noise_robust_vit_tpu.train import (
    make_loader,
    Trainer,
    make_config,
    restore_checkpoint,
)
from noise_robust_vit_tpu.train.data import augment_batch


class Probes(nn.Module):
    num_classes: int
    mlp_hidden: int = 2048

    @nn.compact
    def __call__(self, feats):
        linear = nn.Dense(self.num_classes, name="classifier")(feats)
        h = nn.Dense(self.mlp_hidden, name="mlp_fc1")(feats)
        h = nn.relu(h)
        mlp = nn.Dense(self.num_classes, name="mlp_classifier")(h)
        return linear, mlp


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

    def init_params(self, sample_batch):
        x = jnp.asarray(sample_batch["image"], jnp.float32)
        k1, k2 = jax.random.split(self.next_rng())
        bb = self.backbone.init(k1, x)
        # load frozen backbone weights (ref evaluation.py:136-139; no
        # DDP "module." prefix surgery needed with pytree checkpoints)
        if self.args.checkpoint is not None:
            restored = restore_checkpoint(self.args.checkpoint, bb)
            if restored is not None:
                bb = restored
            else:
                print(f"warning: no checkpoint at {self.args.checkpoint}; "
                      "probing a random backbone")
        self.frozen_backbone_variables = jax.tree_util.tree_map(
            jax.lax.stop_gradient, bb
        )
        feats = self.backbone.apply(bb, x, return_features=True)
        self.probes = Probes(self.num_classes)
        return self.probes.init(k2, feats)

    def compute_loss(self, params, model_state, batch, rng):
        x = augment_batch(rng, batch["image"], strength=self.args.strength, train=True)
        feats = jax.lax.stop_gradient(
            self.backbone.apply(
                self.frozen_backbone_variables, x, return_features=True
            )
        )
        linear, mlp = self.probes.apply({"params": params}, feats)
        y = batch["label"]
        loss = (
            optax.softmax_cross_entropy_with_integer_labels(
                linear.astype(jnp.float32), y
            ).mean()
            + optax.softmax_cross_entropy_with_integer_labels(
                mlp.astype(jnp.float32), y
            ).mean()
        )
        return loss, {"metrics": {}}

    def eval_step(self, params, model_state, batch):
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        feats = self.backbone.apply(
            self.frozen_backbone_variables, x, return_features=True
        )
        linear, mlp = self.probes.apply({"params": params}, feats)
        y = batch["label"]

        def topk(logits):
            top1 = jnp.sum((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            k = min(5, logits.shape[-1])
            _, t5 = jax.lax.top_k(logits, k)
            top5 = jnp.sum(jnp.any(t5 == y[:, None], -1).astype(jnp.float32))
            return top1, top5

        l1, l5 = topk(linear)
        m1, m5 = topk(mlp)
        return {
            "linear_top1": l1, "linear_top5": l5,
            "mlp_top1": m1, "mlp_top5": m5,
            "count": jnp.float32(y.shape[0]),
        }


def build_parser():
    parser = argparse.ArgumentParser(description="frozen probe evaluation")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--strength", type=int, default=0, choices=[0, 1, 2, 3])
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    Model(args)()
