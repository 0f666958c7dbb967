"""Copy-detection evaluation, Copydays protocol (ref examples/
evaluate_copy_detection.py).

Faithful pipeline (ref :272-509): per-distortion query blocks (original /
strong / jpegqual/Q / crops/C — ref :153-181), database = originals (+
distractor folder appended, ref :456-465), features = CLS ⊕ GeM₄-pooled
patch tokens (ref :292-308), whitening learned on a side folder with the
reference's exact arithmetic — mean subtraction on db/queries, PCA(whit=0.5)
on the UNcentered covariance (ref :481-495) — then L2-normalize, cosine
top-20, and **mAP per distortion block** (ref :184-211, :497-508).

The reference's NCCL machinery (init_process_group, async all_gather,
rank-0 index_copy_, barriers — ref :117-150, :310-339) is replaced by a
jitted batched forward; XLA owns the collectives on a mesh.

Run on the real dataset with ``--copydays-path /data/copydays
[--distractors-path DIR --whitening-path DIR]``; without it a synthetic
Copydays tree (originals + real JPEG-quality and crop distortions, cv2) is
generated so the full protocol runs anywhere.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.evaluation import (
    CopydaysBlocks,
    copydays_eval,
    extract_features,
    gem_pool,
)
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.train import restore_checkpoint
from noise_robust_vit_tpu.train.data import augment_batch


def make_synthetic_copydays(root: Path, num_images: int = 16, size: int = 64,
                            seed: int = 0, num_distractors: int = 32,
                            num_whitening: int = 64):
    """Generate a Copydays-layout tree with REAL distortions: JPEG requality
    (cv2 encode at quality Q) and center crops of C% area, plus distractor
    and whitening folders. Ground truth is positional, like the real set."""
    import cv2

    rng = np.random.default_rng(seed)

    def write(p, img):
        p.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(p), img)

    base = []
    for i in range(num_images):
        img = rng.integers(0, 255, (size, size, 3), np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 2.0)  # structure, so JPEG matters
        base.append(img)
        write(root / "original" / f"{200000 + 100 * i}.jpg", img)
        # "strong" attack: heavy blur + brightness shift, same 4-char prefix
        strong = cv2.convertScaleAbs(cv2.GaussianBlur(img, (11, 11), 5.0),
                                     alpha=1.2, beta=20)
        write(root / "strong" / f"{200000 + 100 * i}_attack.jpg", strong)
    for q in (3, 50, 75):
        for i, img in enumerate(base):
            ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
            write(root / "jpegqual" / str(q) / f"{200000 + 100 * i}.jpg",
                  cv2.imdecode(enc, cv2.IMREAD_COLOR))
    for c in (50, 80):
        for i, img in enumerate(base):
            keep = int(size * np.sqrt(c / 100.0))
            o = (size - keep) // 2
            write(root / "crops" / str(c) / f"{200000 + 100 * i}.jpg",
                  img[o : o + keep, o : o + keep])
    for i in range(num_distractors):
        write(root / "distractors" / f"d{i:05d}.jpg",
              rng.integers(0, 255, (size, size, 3), np.uint8))
    for i in range(num_whitening):
        write(root / "whitening" / f"w{i:05d}.jpg",
              rng.integers(0, 255, (size, size, 3), np.uint8))
    return root


class _FileLoader:
    """Minimal batched loader over a file list (decode + center-crop to a
    static shape) — the reference's ImgListDataset role (ref :249-261)."""

    def __init__(self, files, image_size, batch_size):
        self.files = list(files)
        self.image_size = image_size
        self.batch_size = batch_size

    def __iter__(self):
        from noise_robust_vit_tpu.train.image_data import _center_crop, _decode

        n = len(self.files)
        for i in range(0, n, self.batch_size):
            sel = self.files[i : i + self.batch_size]
            imgs = np.stack(
                [_center_crop(_decode(p), self.image_size) for p in sel]
            )
            yield {
                "image": imgs,
                "index": np.arange(i, i + len(sel), dtype=np.int32),
            }


def main(args):
    num_classes, image_size = datasets.NAME_TO_CLASS.get(args.dataset, (100, 64))
    if args.copydays_path is None:
        tmp = Path(tempfile.mkdtemp(prefix="copydays_synth_"))
        print(f"no --copydays-path: generating synthetic Copydays at {tmp}")
        args.copydays_path = make_synthetic_copydays(tmp)
        args.distractors_path = args.copydays_path / "distractors"
        args.whitening_path = args.copydays_path / "whitening"
        image_size = 64

    model = create_model(
        args.architecture, num_classes=num_classes, image_size=image_size
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, sample)
    if args.checkpoint is not None:
        restored = restore_checkpoint(args.checkpoint, variables,
                                      key=args.checkpoint_key)
        if restored is not None:
            variables = restored

    def featurize(images):
        x = augment_batch(jax.random.PRNGKey(0), images, train=False)
        # CLS/pooled ⊕ GeM₄(patch tokens) for token models (ref :294-308)
        tokens = model.apply(variables, x, return_features="tokens")
        pooled = model.apply(variables, x, return_features=True)
        if tokens.ndim == 3:
            return jnp.concatenate([pooled, gem_pool(tokens, p=4.0)], axis=-1)
        return pooled

    def extract(files):
        loader = _FileLoader(files, image_size, args.batch_size)
        feats, _ = extract_features(featurize, loader)
        return feats

    blocks = CopydaysBlocks(args.copydays_path)
    original_files = blocks.block_files("original")
    original_names = [p.name for p in original_files]
    strong_names = (
        [p.name for p in blocks.block_files("strong")]
        if "strong" in blocks.block_names else None
    )

    # queries: every block, concatenated in block order (ref :443-449)
    queries, block_sizes = [], []
    for name in blocks.block_names:
        files = blocks.block_files(name)
        block_sizes.append(len(files))
        queries.append(extract(files))
    queries = np.concatenate(queries)

    # database: originals (+ distractors after, so their ids can't be
    # positives — ref :452-465)
    database = [extract(original_files)]
    if args.distractors_path and Path(args.distractors_path).is_dir():
        dfiles = sorted(
            p for p in Path(args.distractors_path).iterdir()
            if p.suffix.lower() in (".jpg", ".jpeg", ".png")
        )
        print(f"Using {len(dfiles)} distractors...")
        database.append(extract(dfiles))
    database = np.concatenate(database)

    # whitening: reference arithmetic — mean from the side set subtracted
    # from db/queries; PCA(whit=0.5) trained on the UNcentered covariance
    # (ref :481-495)
    if args.whitening_path and Path(args.whitening_path).is_dir():
        wfiles = sorted(
            p for p in Path(args.whitening_path).iterdir()
            if p.suffix.lower() in (".jpg", ".jpeg", ".png")
        )
        wfeats = extract(wfiles).astype(np.float64)
        mean = wfeats.mean(axis=0)
        database = database - mean
        queries = queries - mean
        cov = wfeats.T @ wfeats / len(wfeats)
        eigval, eigvec = np.linalg.eigh(cov)
        order = np.argsort(eigval)[::-1]
        eigval = np.clip(eigval[order], 1e-12, None)
        proj = eigvec[:, order] * (eigval ** -0.5)
        database = database @ proj
        queries = queries @ proj

    # L2 normalize, cosine top-20 (ref :497-506)
    qn = queries / np.clip(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12, None)
    dn = database / np.clip(np.linalg.norm(database, axis=1, keepdims=True), 1e-12, None)
    sim = qn @ dn.T
    ids = np.argsort(-sim, axis=1)[:, : args.topk]

    per_block = copydays_eval(
        ids, blocks.block_names, block_sizes, original_names, strong_names
    )
    for name, m in per_block.items():
        print("eval on %s mAP=%.3f" % (name, m))
    result = {
        "per_block_mAP": per_block,
        "mAP_mean": float(np.mean(list(per_block.values()))),
        "num_queries": int(sum(block_sizes)),
        "num_database": int(len(database)),
    }
    print(json.dumps(result))
    if args.folder:
        args.folder.mkdir(parents=True, exist_ok=True)
        (args.folder / "copy_detection.json").write_text(json.dumps(result))
    return result


def build_parser():
    parser = argparse.ArgumentParser(description="copy detection eval")
    parser.add_argument("--architecture", type=str, default="simple_vit")
    parser.add_argument("--dataset", type=str, default="synthetic")
    parser.add_argument("--copydays-path", type=Path, default=None)
    parser.add_argument("--distractors-path", type=Path, default=None)
    parser.add_argument("--whitening-path", type=Path, default=None)
    parser.add_argument("--checkpoint", type=Path, default=None)
    parser.add_argument("--checkpoint-key", type=str, default=None,
                        help='sub-tree of the checkpoint, e.g. "teacher" '
                             "(ref evaluate_copy_detection.py:380-384)")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--topk", type=int, default=20)
    parser.add_argument("--folder", type=Path, default=None)
    return parser


if __name__ == "__main__":
    from noise_robust_vit_tpu.train.config import honor_platform_env

    honor_platform_env()
    main(build_parser().parse_args())
