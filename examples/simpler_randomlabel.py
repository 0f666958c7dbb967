"""DIET — instance-discrimination via index classification, plus supervised
and CLIP-style modes (ref examples/simpler_randomlabel.py).

Modes:
  * ``--supervised``: plain CE on true labels (ref :177-181).
  * DIET (default): CE of an instance classifier against each sample's own
    (remapped) index, with a detached online probe (ref :213-221).
  * ``--clip``: the sample index is encoded as a 22-bit ±0.5 binary vector
    through an index-encoder MLP; symmetric InfoNCE between index encodings
    and projected features at ``--temperature`` (ref :186-212).

Index plumbing: ``--max-indices`` subsets the train set and remaps kept
indices to [0, max) (ref :43-64); ``--indices-from`` loads k-means cluster
assignments (from build_grouping.py) as instance labels (ref :65-70).
Per-param-group lr/wd scaling of the instance-classifier weight
(ref :255-286) via ``optax.multi_transform``. MultiStepLR ≤100 epochs
(ref :242-253).
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
from noise_robust_vit_tpu.train import make_loader, Trainer, make_config, multistep
from noise_robust_vit_tpu.train.data import augment_batch
from noise_robust_vit_tpu.train.optim import adamw


class IndexEncoder(nn.Module):
    """22-bit index → clip_output_dim embedding (ref :159-166)."""

    out_dim: int

    @nn.compact
    def __call__(self, bits, *, deterministic: bool = True):
        x = nn.Dense(512, name="fc0")(bits)
        x = nn.BatchNorm(use_running_average=deterministic, name="bn0")(x)
        x = nn.relu(x)
        x = nn.Dense(512, use_bias=False, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=deterministic, name="bn1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, name="out")(x)


class Projector(nn.Module):
    """MLP projector ahead of the instance classifier (ref :136-155): depth 0
    is a plain Linear; otherwise Linear(fan_in, w) + depth × [BN, ReLU,
    Linear(w, w, no-bias)] with the last no-bias Linear replaced by
    Linear(w, out_dim) (the reference pops it)."""

    out_dim: int
    width: int
    depth: int

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.depth == 0:
            return nn.Dense(self.out_dim)(x)
        x = nn.Dense(self.width)(x)
        for i in range(self.depth):
            x = nn.BatchNorm(use_running_average=deterministic)(x)
            x = nn.relu(x)
            if i < self.depth - 1:
                x = nn.Dense(self.width, use_bias=False)(x)
        return nn.Dense(self.out_dim)(x)


class Model(Trainer):
    def initialize_train_loader(self):
        args = self.args
        self.num_classes, self.image_size = datasets.NAME_TO_CLASS.get(
            args.dataset, (100, 32)
        )
        ds = datasets.get_dataset(args.dataset_path, "train", name=args.dataset)
        n = len(ds)
        index_to_class = np.arange(n, dtype=np.int64)
        indices = None
        if n > args.max_indices:
            rng = np.random.RandomState(args.indices_seed)
            kept = rng.permutation(n)[: args.max_indices]
            index_to_class[:] = -1
            index_to_class[kept] = np.arange(len(kept))
            indices = kept
            n = len(kept)
        self.train_samples = n
        if args.indices_from is not None and Path(args.indices_from).is_file():
            index_to_class = np.load(args.indices_from, allow_pickle=True)["indices"]
            self.train_samples = int(index_to_class.max() + 1)
        self.index_to_class = index_to_class.astype(np.int32)
        return make_loader(ds, args.batch_size, train=True,
                           image_size=self.image_size, seed=args.seed,
                           indices=indices)

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

    def initialize_optimizer(self, total_steps):
        args = self.args
        if args.epochs > 100:
            sched = None
            base = super().initialize_optimizer(total_steps)
        else:
            steps = total_steps // args.epochs
            sched = multistep(
                args.learning_rate,
                [int(args.epochs * 0.5) * steps, int(args.epochs * 0.75) * steps],
                gamma=0.1,
            )
            base = adamw(sched, weight_decay=args.weight_decay,
                         b1=args.beta1, b2=args.beta2,
                         grad_max_norm=args.grad_max_norm)
        if args.clip or (args.lr_scaling == 1.0 and args.wd_scaling == 1.0):
            return base
        # scaled group for the instance-classifier weight (ref :255-286)
        if sched is None:
            scaled_lr = args.learning_rate * args.lr_scaling
        else:
            scaled_lr = lambda step: sched(step) * args.lr_scaling
        scaled = adamw(
            scaled_lr,
            weight_decay=args.weight_decay * args.wd_scaling,
            b1=args.beta1, b2=args.beta2,
        )

        def label_fn(params):
            def mark(path, _):
                keys = [getattr(p, "key", "") for p in path]
                return "scaled" if "extra_classifier" in keys else "base"

            return jax.tree_util.tree_map_with_path(mark, params)

        return optax.multi_transform({"base": base, "scaled": scaled}, label_fn)

    def init_params(self, sample_batch):
        args = self.args
        x = jnp.asarray(sample_batch["image"], jnp.float32)
        keys = jax.random.split(self.next_rng(), 4)
        bb = self.backbone.init(keys[0], x)
        feats = self.backbone.apply(bb, x, return_features=True)
        fan_in = feats.shape[-1]
        self.classifier = nn.Dense(self.num_classes)
        cl = self.classifier.init(keys[1], feats)
        out_dim = args.clip_output_dim if args.clip else self.train_samples
        self.extra_classifier = Projector(
            out_dim, args.projector_width, args.projector_depth
        )
        ec = self.extra_classifier.init(keys[2], feats)
        variables = {}
        parts = {"backbone": bb, "classifier": cl, "extra_classifier": ec}
        if args.clip:
            self.index_encoding = IndexEncoder(args.clip_output_dim)
            parts["index_encoding"] = self.index_encoding.init(
                keys[3], jnp.zeros((2, 22))
            )
        for name, tree in parts.items():
            for col in tree:
                variables.setdefault(col, {})[name] = dict(tree[col])
        return variables

    def _features(self, params, model_state, x, train, rng=None):
        bb_state = {c: s.get("backbone", {}) for c, s in model_state.items()}
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

    def _project(self, params, model_state, feats, train):
        """Instance projector/classifier apply; mutable BN stats when the
        projector is an MLP (ref :136-155)."""
        ec_state = {
            c: s["extra_classifier"]
            for c, s in model_state.items() if "extra_classifier" in s
        }
        variables = {"params": params["extra_classifier"], **ec_state}
        if train and self.args.projector_depth > 0:
            return self.extra_classifier.apply(
                variables, feats, deterministic=False, mutable=["batch_stats"]
            )
        return self.extra_classifier.apply(variables, feats), None

    def compute_loss(self, params, model_state, batch, rng):
        args = self.args
        k_aug, k_drop = jax.random.split(rng)
        x = augment_batch(k_aug, batch["image"], strength=args.strength, train=True)
        labels = batch["label"]
        feats, bb_upd = self._features(params, model_state, x, True, k_drop)

        def merge_state(*extras):
            # structure must match the initial model_state exactly: only
            # overwrite children that already exist
            out = {}
            for col, s in model_state.items():
                out[col] = dict(s)
                if bb_upd and col in bb_upd and "backbone" in s:
                    out[col]["backbone"] = bb_upd[col]
                for extra in extras:
                    if extra and extra[1] and col in extra[1] and extra[0] in s:
                        out[col][extra[0]] = extra[1][col]
            return out

        if args.supervised:
            logits = self.classifier.apply({"params": params["classifier"]}, feats)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()
            return loss, {"metrics": {}, "model_state": merge_state()}

        probe = self.classifier.apply(
            {"params": params["classifier"]}, jax.lax.stop_gradient(feats)
        )
        true_loss = optax.softmax_cross_entropy_with_integer_labels(
            probe.astype(jnp.float32), labels
        ).mean()

        z = batch["instance_label"]
        if args.clip:
            # 22-bit ±0.5 binary encoding (ref :186-196)
            mask = 2 ** jnp.arange(22, dtype=jnp.int32)
            bits = ((z[:, None] & mask) != 0).astype(jnp.float32) - 0.5
            ie_state = {c: s.get("index_encoding", {}) for c, s in model_state.items()}
            idx_emb, ie_upd = self.index_encoding.apply(
                {"params": params["index_encoding"], **ie_state}, bits,
                deterministic=False, mutable=["batch_stats"],
            )
            proj, ec_upd = self._project(params, model_state, feats, True)

            def norm(t):
                return t / jnp.clip(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)

            sim = norm(proj) @ norm(idx_emb).T / args.temperature
            diag = jnp.arange(sim.shape[0])
            onehot = optax.smooth_labels(
                jax.nn.one_hot(diag, sim.shape[0]), args.label_smoothing
            )
            loss_t = optax.softmax_cross_entropy(sim.astype(jnp.float32), onehot).mean()
            loss_i = optax.softmax_cross_entropy(sim.T.astype(jnp.float32), onehot).mean()
            other = (loss_t + loss_i) / 2
            new_state = merge_state(("index_encoding", ie_upd),
                                    ("extra_classifier", ec_upd))
        else:
            inst, ec_upd = self._project(params, model_state, feats, True)
            onehot = optax.smooth_labels(
                jax.nn.one_hot(z, self.train_samples), args.label_smoothing
            )
            other = optax.softmax_cross_entropy(inst.astype(jnp.float32), onehot).mean()
            new_state = merge_state(("extra_classifier", ec_upd))
        return other + true_loss, {
            "metrics": {"inst_loss": other, "probe_loss": true_loss},
            "model_state": new_state,
        }

    def eval_step(self, params, model_state, batch):
        x = augment_batch(jax.random.PRNGKey(0), batch["image"], train=False)
        feats, _ = self._features(params, model_state, x, False)
        probe = self.classifier.apply({"params": params["classifier"]}, feats)
        y = batch["label"]
        top1 = jnp.sum((jnp.argmax(probe, -1) == y).astype(jnp.float32))
        k = min(5, probe.shape[-1])
        _, t5 = jax.lax.top_k(probe, k)
        top5 = jnp.sum(jnp.any(t5 == y[:, None], -1).astype(jnp.float32))
        return {"accus": top1, "accus5": top5, "count": jnp.float32(y.shape[0])}

    def _shard_batch(self, batch):
        batch = dict(batch)
        batch["instance_label"] = self.index_to_class[batch.pop("index")]
        return super()._shard_batch(batch)


def build_parser():
    parser = argparse.ArgumentParser(description="DIET training")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--supervised", action="store_true")
    parser.add_argument("--clip", action="store_true")
    parser.add_argument("--clip-output-dim", type=int, default=256)
    parser.add_argument("--temperature", type=float, default=0.1)
    parser.add_argument("--strength", type=int, default=0, choices=[0, 1, 2, 3])
    parser.add_argument("--max-indices", type=int, default=10**9)
    parser.add_argument("--indices-seed", type=int, default=0)
    parser.add_argument("--indices-from", type=Path, default=None)
    parser.add_argument("--lr-scaling", type=float, default=1.0)
    parser.add_argument("--wd-scaling", type=float, default=1.0)
    parser.add_argument("--projector-depth", type=int, default=0)
    parser.add_argument("--projector-width", type=int, default=1024)
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    Model(args)()
