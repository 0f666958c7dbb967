"""Copy-detection evaluation, Copydays-style (ref examples/
evaluate_copy_detection.py).

Pipeline (ref :272-509): extract features for queries / database /
distractors / whitening-train sets — CLS ⊕ GeM₄-pooled patch tokens for ViT
backbones (ref :292-308) — learn PCA whitening on the side set (ref :471-495),
L2-normalize, cosine top-20, then mAP per distortion block (ref :184-245).

The reference's NCCL machinery (init_process_group, async all_gather,
rank-0 index_copy_, barriers — ref :117-150, :310-339) is replaced by a
jitted batched forward; XLA owns the collectives on a mesh.

Dataset layout: ``--dataset-path`` with ``queries.npz / database.npz /
distractors.npz / whitening.npz`` (each ``images``+``labels``); synthetic
fallback otherwise so the pipeline is runnable anywhere.
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
from noise_robust_vit_tpu.evaluation import (
    PCAWhitening,
    cosine_topk,
    extract_features,
    gem_pool,
)
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import DataLoader, restore_checkpoint
from noise_robust_vit_tpu.train.data import augment_batch


def _load_split(path, split, n, image_size, seed):
    if path is not None and (Path(path) / f"{split}.npz").exists():
        d = np.load(Path(path) / f"{split}.npz")
        return datasets.ArrayDataset(d["images"], d["labels"].astype(np.int32))
    return datasets.synthetic_dataset(n, image_size, 50, seed=seed, learnable=True)


def main(args):
    num_classes, image_size = datasets.NAME_TO_CLASS.get(args.dataset, (100, 32))
    model = create_model(
        args.architecture, num_classes=num_classes, image_size=image_size
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, sample)
    if args.checkpoint is not None:
        restored = restore_checkpoint(args.checkpoint, variables)
        if restored is not None:
            variables = restored

    def featurize(images):
        x = augment_batch(jax.random.PRNGKey(0), images, train=False)
        # ViT-family models with token outputs get CLS/pooled ⊕ GeM₄-pooled
        # patch tokens (ref :294-308); models without a token view fall back
        # to pooled features (detected by rank — a "tokens" request on such
        # models returns the pooled [B, D] vector)
        tokens = model.apply(variables, x, return_features="tokens")
        pooled = model.apply(variables, x, return_features=True)
        if tokens.ndim == 3:
            return jnp.concatenate([pooled, gem_pool(tokens, p=4.0)], axis=-1)
        return pooled

    splits = {}
    for split, n, seed in (
        ("queries", 64, 10), ("database", 256, 11),
        ("distractors", 128, 12), ("whitening", 256, 13),
    ):
        ds = _load_split(args.dataset_path, split, n, image_size, seed)
        loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False)
        feats, _ = extract_features(featurize, loader)
        splits[split] = (feats, ds.labels)

    pca = PCAWhitening(dim=min(args.pca_dim, splits["whitening"][0].shape[1]))
    pca.train(splits["whitening"][0])
    qf = pca.apply(splits["queries"][0])
    dbf = pca.apply(np.concatenate([splits["database"][0], splits["distractors"][0]]))
    db_labels = np.concatenate(
        [splits["database"][1], np.full(len(splits["distractors"][0]), -1)]
    )

    scores, idx = cosine_topk(qf, dbf, k=args.topk)
    # mAP: a database hit is positive if it shares the query's label
    q_labels = splits["queries"][1]
    aps = []
    for i in range(len(qf)):
        rel = (db_labels[idx[i]] == q_labels[i]).astype(np.float32)
        if rel.sum() == 0:
            aps.append(0.0)
            continue
        cum = np.cumsum(rel)
        prec = cum / (np.arange(len(rel)) + 1)
        aps.append(float((prec * rel).sum() / rel.sum()))
    result = {"mAP": float(np.mean(aps)), "num_queries": len(qf)}
    print(json.dumps(result))
    if args.folder:
        args.folder.mkdir(parents=True, exist_ok=True)
        (args.folder / "copy_detection.json").write_text(json.dumps(result))
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="copy detection eval")
    parser.add_argument("--architecture", type=str, default="simple_vit")
    parser.add_argument("--dataset", type=str, default="synthetic")
    parser.add_argument("--dataset-path", type=Path, default=None)
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--pca-dim", type=int, default=256)
    parser.add_argument("--topk", type=int, default=20)
    parser.add_argument("--folder", type=Path, default=None)
    main(parser.parse_args())
