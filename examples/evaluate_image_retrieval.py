"""Revisited-Oxford/Paris image retrieval evaluation
(ref examples/evaluate_image_retrieval.py).

Extract query/database features, rank by cosine similarity, and report mAP
under the Medium and Hard protocols with junk handling
(ref :96-200 ``compute_ap/compute_map``, :436-452 protocol assembly).
Ground truth comes from a ``gnd.json`` file
(``{"gnd": [{"easy": [...], "hard": [...], "junk": [...]}, ...]}``) under
``--dataset-path``; synthetic label-based ground truth otherwise.
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
from noise_robust_vit_tpu.evaluation import compute_map, extract_features
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import DataLoader, restore_checkpoint
from noise_robust_vit_tpu.train.data import augment_batch


def main(args):
    num_classes, image_size = datasets.NAME_TO_CLASS.get(args.dataset, (100, 32))
    model = create_model(
        args.architecture, num_classes=num_classes, image_size=image_size
    )
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, image_size, image_size, 3)))
    if args.checkpoint is not None:
        restored = restore_checkpoint(args.checkpoint, variables,
                                      key=args.checkpoint_key)
        if restored is not None:
            variables = restored

    def featurize(images):
        x = augment_batch(jax.random.PRNGKey(0), images, train=False)
        return model.apply(variables, x, return_features=True)

    def load(split, n, seed):
        p = args.dataset_path
        if p is not None and (Path(p) / f"{split}.npz").exists():
            d = np.load(Path(p) / f"{split}.npz")
            return datasets.ArrayDataset(d["images"], d["labels"].astype(np.int32))
        return datasets.synthetic_dataset(n, image_size, 20, seed=seed)

    qds = load("queries", 32, 20)
    dds = load("database", 256, 21)
    qf, _ = extract_features(
        featurize, DataLoader(qds, args.batch_size, shuffle=False, drop_last=False)
    )
    dbf, _ = extract_features(
        featurize, DataLoader(dds, args.batch_size, shuffle=False, drop_last=False)
    )

    q = qf / np.clip(np.linalg.norm(qf, axis=1, keepdims=True), 1e-12, None)
    d = dbf / np.clip(np.linalg.norm(dbf, axis=1, keepdims=True), 1e-12, None)
    sim = d @ q.T  # [num_db, num_q]
    ranks = np.argsort(-sim, axis=0)

    gnd_path = Path(args.dataset_path) / "gnd.json" if args.dataset_path else None
    if gnd_path is not None and gnd_path.exists():
        gnd = json.loads(gnd_path.read_text())["gnd"]
        # Medium: easy+hard positives, junk junk; Hard: hard positives,
        # easy+junk junk (ref :436-452)
        gnd_m = [
            {"ok": np.concatenate([g["easy"], g["hard"]]), "junk": g.get("junk", [])}
            for g in gnd
        ]
        gnd_h = [
            {"ok": np.asarray(g["hard"]),
             "junk": np.concatenate([g.get("junk", []), g["easy"]])}
            for g in gnd
        ]
    else:
        gnd_m = [
            {"ok": np.nonzero(dds.labels == ql)[0], "junk": np.array([])}
            for ql in qds.labels
        ]
        gnd_h = gnd_m
    mapM, _, _ = compute_map(ranks, gnd_m, kappas=(1, 5, 10))
    mapH, _, _ = compute_map(ranks, gnd_h, kappas=(1, 5, 10))
    result = {"mAP_medium": float(mapM), "mAP_hard": float(mapH)}
    print(json.dumps(result))
    if args.folder:
        args.folder.mkdir(parents=True, exist_ok=True)
        (args.folder / "image_retrieval.json").write_text(json.dumps(result))
    return result


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="image retrieval eval")
    parser.add_argument("--architecture", type=str, default="simple_vit")
    parser.add_argument("--dataset", type=str, default="synthetic")
    parser.add_argument("--dataset-path", type=Path, default=None)
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--checkpoint-key", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--folder", type=Path, default=None)
    from noise_robust_vit_tpu.train.config import honor_platform_env

    honor_platform_env()
    main(parser.parse_args())
