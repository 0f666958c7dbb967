"""Instance-label (DIET/random-label) memorization study
(ref examples/randomlabel.py).

Backbone + projector + ``extra_classifier`` over ``train_samples``
instance-label classes (each sample's own index is its label), with a
DETACHED online linear probe on the true classes (ref randomlabel.py:210-213).
Six instance-loss variants ``ce/sce/l2/bce/l1/sboot``
(ref randomlabel.py:224-251), dropout-before-ReLU ``MyReLU``
(ref randomlabel.py:18-27 → ResNet ``relu_dropout``), dataset
subsetting/stratification (ref randomlabel.py:30-57), factorized extra
classifier for large datasets (ref randomlabel.py:165-181), and the
accuracy-floor TRIPWIRES that abort underperforming runs at epochs 19/99
(ref randomlabel.py:273-334 — the deliberate ``afd`` NameError becomes a
typed ``AccuracyFloorError``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import make_loader, Trainer, make_config
from noise_robust_vit_tpu.train.data import augment_batch


class AccuracyFloorError(RuntimeError):
    """The reference kills bad runs with an ``afd`` NameError
    (ref randomlabel.py:277 etc.); this is its typed equivalent."""


# per-dataset (epoch19, ep99@s0, ep99@s3) probe-accuracy floors
# (ref randomlabel.py:273-334; BASELINE.md table)
FLOORS = {
    "TinyImageNet": {19: {None: 0.08}, 99: {0: 0.16, 3: 0.27}},
    "FGVCAircraft": {19: {None: 0.03}, 99: {0: 0.07, 3: 0.12}},
    "Food101": {19: {0: 0.11, 3: 0.15}, 99: {0: 0.17, 3: 0.27}},
    "CIFAR100": {19: {0: 0.15, 3: 0.20}, 99: {0: 0.22, 3: 0.31}},
    "CIFAR10": {19: {0: 0.35, 3: 0.45}, 99: {0: 0.50, 3: 0.65}},
    "OxfordIIITPet": {19: {0: 0.045, 3: 0.065}, 99: {0: 0.14, 3: 0.23}},
}


def check_floor(dataset: str, epoch: int, strength: int, accu: float,
                total_epochs: int) -> None:
    """(ref randomlabel.py:273-334.)"""
    if total_epochs > 100 or dataset not in FLOORS:
        return
    floors = FLOORS[dataset].get(epoch)
    if not floors:
        return
    floor = floors.get(strength, floors.get(None))
    if floor is not None and accu < floor:
        raise AccuracyFloorError(
            f"{dataset} probe top-1 {accu:.3f} < floor {floor} "
            f"at epoch {epoch} (strength {strength})"
        )


def subset_indices(labels: np.ndarray, percentage: float, stratify: bool, seed: int):
    """(ref randomlabel.py:30-57 MyDataset.)"""
    n = len(labels)
    if percentage >= 1:
        return np.arange(n)
    rng = np.random.RandomState(seed)
    if not stratify:
        return rng.permutation(n)[: int(percentage * n)]
    out = []
    for cls in np.unique(labels):
        idx = np.nonzero(labels == cls)[0]
        out.extend(rng.choice(idx, size=int(len(idx) * percentage), replace=False))
    return np.asarray(sorted(out))


class Heads(nn.Module):
    """Projector + instance classifier + detached probe
    (ref randomlabel.py:163-194)."""

    feat_dim: int
    train_samples: int
    num_classes: int
    projector_depth: int = 0
    projector_width: int = 2048

    @nn.compact
    def __call__(self, feats, *, deterministic: bool = True):
        probe_logits = nn.Dense(self.num_classes, name="classifier")(
            jax.lax.stop_gradient(feats)
        )
        z = feats
        if self.projector_depth > 0:
            for l in range(self.projector_depth):
                z = nn.Dense(self.projector_width, use_bias=False, name=f"proj_{l}")(z)
                z = nn.BatchNorm(
                    use_running_average=deterministic, name=f"proj_bn_{l}"
                )(z)
                z = nn.relu(z)
            inst_logits = nn.Dense(self.train_samples, name="extra_classifier")(z)
        else:
            # factorized instance classifier for big datasets
            # (ref randomlabel.py:165-181)
            if self.train_samples > 1_100_000 and self.feat_dim > 256:
                z = nn.Dense(256, use_bias=False, name="extra_fact")(z)
            elif self.train_samples > 200_000 and self.feat_dim > 512:
                z = nn.Dense(512, use_bias=False, name="extra_fact")(z)
            inst_logits = nn.Dense(self.train_samples, name="extra_classifier")(z)
        return inst_logits, probe_logits


def instance_loss(name: str, logits, z, train_samples, label_smoothing=0.0, beta=0.9):
    """The six instance-label objectives (ref randomlabel.py:224-251)."""
    logits = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(z, train_samples)
    smoothed = optax.smooth_labels(onehot, label_smoothing) if label_smoothing else onehot
    if name == "ce":
        return optax.softmax_cross_entropy(logits, smoothed).mean()
    if name == "sce":
        fwd = optax.softmax_cross_entropy(logits, smoothed).mean()
        rev = jnp.sum(
            jax.nn.softmax(logits, -1) * jnp.log(jnp.clip(onehot, 0.001)), -1
        ).mean()
        return fwd + rev
    if name == "l2":
        return jnp.mean((logits - onehot) ** 2)
    if name == "bce":
        return optax.sigmoid_binary_cross_entropy(logits, onehot).mean()
    if name == "l1":
        return jnp.mean(jnp.abs(logits - onehot))
    if name == "sboot":
        target = onehot * beta + jax.nn.softmax(logits, -1) * (1 - beta)
        if label_smoothing:
            target = optax.smooth_labels(target, label_smoothing)
        return optax.softmax_cross_entropy(logits, target).mean()
    raise ValueError(f"unknown loss {name!r}")


class Model(Trainer):
    def initialize_train_loader(self):
        self.num_classes, self.image_size = datasets.NAME_TO_CLASS.get(
            self.args.dataset, (100, 32)
        )
        ds = datasets.get_dataset(self.args.dataset_path, "train", name=self.args.dataset)
        indices = subset_indices(
            ds.labels, self.args.percentage, self.args.stratify, self.args.seed
        )
        loader = make_loader(
            ds, self.args.batch_size, train=True,
            image_size=self.image_size, seed=self.args.seed, indices=indices,
        )
        # instance labels are positions within the kept subset
        self.index_remap = np.full(len(ds), -1, np.int32)
        self.index_remap[indices] = np.arange(len(indices), dtype=np.int32)
        self.train_samples = len(indices)
        return loader

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
            relu_dropout=self.args.proba,
        ) if self.args.architecture.startswith("resnet") else create_model(
            self.args.architecture,
            num_classes=self.num_classes,
            image_size=self.image_size,
        )
        self.model = self.backbone  # for Trainer.init_params

    def init_params(self, sample_batch):
        x = jnp.asarray(sample_batch["image"], jnp.float32)
        k1, k2 = jax.random.split(self.next_rng())
        bb_vars = self.backbone.init(k1, x)
        feats = self.backbone.apply(bb_vars, x, return_features=True)
        self.heads = Heads(
            feat_dim=feats.shape[-1],
            train_samples=self.train_samples,
            num_classes=self.num_classes,
            projector_depth=self.args.projector_depth,
            projector_width=self.args.projector_width,
        )
        head_vars = self.heads.init(k2, feats)
        variables = {}
        for col in set(bb_vars) | set(head_vars):
            variables[col] = {
                "backbone": dict(bb_vars.get(col, {})),
                "heads": dict(head_vars.get(col, {})),
            }
        return variables

    def _apply(self, params, model_state, x, train, rng=None):
        bb_state = {c: s["backbone"] for c, s in model_state.items()}
        hd_state = {c: s["heads"] for c, s in model_state.items()}
        new_state = {}
        if train:
            feats, bb_upd = self.backbone.apply(
                {"params": params["backbone"], **bb_state}, x,
                deterministic=False, return_features=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            out, hd_upd = self.heads.apply(
                {"params": params["heads"], **hd_state}, feats,
                deterministic=False, mutable=["batch_stats"],
            )
            for col in set(model_state) | set(bb_upd) | set(hd_upd):
                new_state[col] = {
                    "backbone": bb_upd.get(col, bb_state.get(col, {})),
                    "heads": hd_upd.get(col, hd_state.get(col, {})),
                }
            return out, new_state
        feats = self.backbone.apply(
            {"params": params["backbone"], **bb_state}, x, return_features=True
        )
        out = self.heads.apply({"params": params["heads"], **hd_state}, feats)
        return out, model_state

    def compute_loss(self, params, model_state, batch, rng):
        k_aug, k_drop = jax.random.split(rng)
        x = augment_batch(k_aug, batch["image"], strength=self.args.strength, train=True)
        z = batch["instance_label"]
        y = batch["label"]
        (inst_logits, probe_logits), new_state = self._apply(
            params, model_state, x, train=True, rng=k_drop
        )
        other = instance_loss(
            self.args.loss, inst_logits, z, self.train_samples,
            self.args.label_smoothing, self.args.beta,
        )
        true = optax.softmax_cross_entropy_with_integer_labels(
            probe_logits.astype(jnp.float32), y
        ).mean()
        return other + true, {
            "metrics": {"inst_loss": other, "probe_loss": true},
            "model_state": new_state,
        }

    def eval_step(self, params, model_state, batch):
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        (_, probe_logits), _ = self._apply(params, model_state, x, train=False)
        y = batch["label"]
        top1 = jnp.sum((jnp.argmax(probe_logits, -1) == y).astype(jnp.float32))
        k = min(5, probe_logits.shape[-1])
        _, top5_idx = jax.lax.top_k(probe_logits, k)
        top5 = jnp.sum(jnp.any(top5_idx == y[:, None], axis=-1).astype(jnp.float32))
        return {"accus": top1, "accus5": top5, "count": jnp.float32(y.shape[0])}

    def after_eval_epoch(self, metrics):
        self.log_txt("eval_accuracies", epoch=self.epoch, **metrics)
        check_floor(
            self.args.dataset, self.epoch, self.args.strength,
            metrics.get("accus", 1.0), self.args.epochs,
        )

    def _shard_batch(self, batch):
        batch = dict(batch)
        batch["instance_label"] = self.index_remap[batch.pop("index")]
        return super()._shard_batch(batch)


def build_parser():
    parser = argparse.ArgumentParser(description="instance-label training")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--loss", type=str, default="ce",
                        choices=["ce", "sce", "l2", "bce", "l1", "sboot"])
    parser.add_argument("--beta", type=float, default=0.9)
    parser.add_argument("--proba", type=float, default=0.0)
    parser.add_argument("--strength", type=int, default=0, choices=[0, 1, 2, 3])
    parser.add_argument("--percentage", type=float, default=1.0)
    parser.add_argument("--stratify", action="store_true")
    parser.add_argument("--projector-depth", type=int, default=0)
    parser.add_argument("--projector-width", type=int, default=2048)
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    Model(args)()
