"""Build pseudo-label groupings by random projection + spherical k-means
(ref examples/build_grouping.py): project flattened images (H·W·C → D=4096),
cluster to k groups on device, save ``indices`` (per-sample cluster) +
``centroids`` as an npz consumed by simpler_randomlabel's ``--indices-from``.

The reference used faiss GPU k-means (ref build_grouping.py:38-52); here the
clustering is the jitted TPU k-means of ``ops/kmeans.py``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.ops.kmeans import kmeans
from noise_robust_vit_tpu.train import make_loader
from noise_robust_vit_tpu.train.data import augment_batch


def main(args):
    _, image_size = datasets.NAME_TO_CLASS.get(args.dataset, (100, 32))
    ds = datasets.get_dataset(args.dataset_path, "train", name=args.dataset)
    loader = make_loader(ds, args.batch_size, train=False,
                         image_size=image_size)
    d = args.proj_dim
    key = jax.random.PRNGKey(args.seed)
    # feature dim from the loader's static batch shape (works for lazily
    # decoded ImageFolder datasets too, which carry no .images array)
    sample = next(iter(loader))["image"]
    feat_dim = int(np.prod(sample.shape[1:]))
    w = jax.random.normal(key, (feat_dim, d), jnp.float32) / np.sqrt(feat_dim)

    @jax.jit
    def project(images):
        x = augment_batch(jax.random.PRNGKey(0), images, train=False)
        x = x.reshape(x.shape[0], -1)
        x = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12, None)
        return x @ w

    # scatter by batch index — loaders may drop a trailing partial batch
    # (ImageFolderLoader keeps shapes static); stragglers get a padded pass
    x_train = np.zeros((len(ds), d), np.float32)
    seen = np.zeros(len(ds), bool)
    for b in loader:
        emb = np.asarray(jax.device_get(project(jnp.asarray(b["image"]))))
        x_train[b["index"]] = emb
        seen[b["index"]] = True
    missing = np.nonzero(~seen)[0]
    if len(missing):
        load_one = getattr(loader, "_load_one", None)
        imgs = np.stack([load_one(int(i)) for i in missing]) if load_one \
            else ds.images[missing]
        pad = args.batch_size - len(imgs) % args.batch_size
        if pad != args.batch_size:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        emb = np.asarray(jax.device_get(project(jnp.asarray(imgs))))
        x_train[missing] = emb[: len(missing)]

    for k in args.clusters:
        centroids, indices = kmeans(
            jax.random.fold_in(key, k), jnp.asarray(x_train), k=k,
            niter=args.niter, spherical=True,
        )
        out = Path(args.output or ".") / f"randomproj_{d}_grouped_{k}.npz"
        np.savez(
            out,
            indices=np.asarray(jax.device_get(indices)),
            centroids=np.asarray(jax.device_get(centroids[:100])),
        )
        print(f"wrote {out} ({k} clusters)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="pseudo-label grouping")
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--dataset-path", type=Path, default=None)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--proj-dim", type=int, default=4096)
    parser.add_argument("--clusters", type=int, nargs="+", default=[1000])
    parser.add_argument("--niter", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", type=Path, default=None)
    from noise_robust_vit_tpu.train.config import honor_platform_env

    honor_platform_env()
    main(parser.parse_args())
