"""Visualize the device-side augmentation pipeline at strengths 0-3
(ref examples/test_ffcv.py:6-32 — image grids of the FFCV pipeline).
Writes ``augmentations_s{0..3}.png`` grids when matplotlib is available;
always prints per-strength statistics."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.train.data import IMAGENET_MEAN, IMAGENET_STD, augment_batch


def main(args):
    ds = datasets.get_dataset(args.dataset_path, "train", name=args.dataset)
    imgs = ds.images[: args.n]
    for strength in (0, 1, 2, 3):
        out = augment_batch(
            jax.random.PRNGKey(args.seed), jnp.asarray(imgs),
            strength=strength, train=True, noise_std=args.noise_std,
        )
        arr = np.asarray(out)
        print(f"strength {strength}: mean={arr.mean():+.3f} std={arr.std():.3f}")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            denorm = arr * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
            denorm = np.clip(denorm, 0, 1)
            fig, axes = plt.subplots(1, args.n, figsize=(2 * args.n, 2))
            for ax, im in zip(np.atleast_1d(axes), denorm):
                ax.imshow(im)
                ax.axis("off")
            fig.savefig(f"augmentations_s{strength}.png", dpi=100,
                        bbox_inches="tight")
            plt.close(fig)
        except Exception:
            pass


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--dataset-path", type=Path, default=None)
    parser.add_argument("--n", type=int, default=6)
    parser.add_argument("--noise-std", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    from noise_robust_vit_tpu.train.config import honor_platform_env

    honor_platform_env()
    main(parser.parse_args())
