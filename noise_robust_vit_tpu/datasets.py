"""Dataset constructors and registry.

The reference package imports a ``datasets`` module that was never committed
(ref __init__.py:7 — SURVEY.md §8 landmine 1); its intended surface is
reconstructed from call sites: ``imagenet_train_dataset/val_dataset(path)``
(ref examples/CIFAR100.py:18-21, :43-46) and the ``omega.dataset``
name→(num_classes, image_size) registry (ref examples/evaluation.py:14-15).

Concrete loaders here are host-side and minimal: CIFAR-10/100 python-pickle
binaries, NPZ ImageFolder dumps, and a seeded synthetic fallback so every
experiment runs end-to-end on a fresh machine. Augmentation happens on
device (`train/data.py::augment_batch`), not here.
"""

from __future__ import annotations

import pickle
import tarfile
from pathlib import Path

import numpy as np

from .train.data import ArrayDataset

__all__ = [
    "NAME_TO_CLASS",
    "get_dataset",
    "imagenet_train_dataset",
    "imagenet_val_dataset",
    "load_cifar",
    "synthetic_dataset",
]

# name -> (num_classes, image_size) (ref omega.dataset.NAME_TO_CLASS usage,
# evaluation.py:14-15; entries cover the datasets of randomlabel.py:359-406)
NAME_TO_CLASS: dict[str, tuple[int, int]] = {
    "CIFAR10": (10, 32),
    "CIFAR100": (100, 32),
    "TinyImageNet": (200, 64),
    "ImageNet": (1000, 224),
    "ImageNet100": (100, 224),
    "INaturalist": (10000, 224),
    "Food101": (101, 224),
    "FGVCAircraft": (100, 224),
    "OxfordIIITPet": (37, 224),
    "StanfordCars": (196, 224),
    "Flowers102": (102, 224),
    "DTD": (47, 224),
    "CUB_200_2011": (200, 224),
    "synthetic": (100, 32),
}


def synthetic_dataset(
    num_samples: int = 2048,
    image_size: int = 32,
    num_classes: int = 100,
    seed: int = 0,
    learnable: bool = True,
) -> ArrayDataset:
    """Seeded synthetic images. With ``learnable=True``, images carry a
    class-dependent low-frequency pattern so training curves move (used by
    tests and smoke runs)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_samples).astype(np.int32)
    images = rng.integers(0, 256, (num_samples, image_size, image_size, 3))
    if learnable:
        ys = np.linspace(0, 2 * np.pi, image_size)
        grid = np.stack(np.meshgrid(ys, ys, indexing="ij"), -1)  # [H,W,2]
        # class patterns come from a FIXED rng so train/val splits (different
        # ``seed``) share the same class→pattern mapping; only the noise and
        # label draws vary per split
        pattern_rng = np.random.default_rng(1234567)
        freqs = pattern_rng.uniform(0.5, 3.0, (num_classes, 2))
        pattern = np.sin(grid @ freqs.T.reshape(2, num_classes))  # [H,W,K]
        signal = pattern[..., labels].transpose(2, 0, 1)  # [N,H,W]
        images = images * 0.3 + (signal[..., None] * 0.5 + 0.5) * 255 * 0.7
    return ArrayDataset(images.astype(np.uint8), labels)


def _cifar_batches(root: Path, names: list[str], label_key: bytes):
    xs, ys = [], []
    for name in names:
        with open(root / name, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.append(np.asarray(d[label_key]))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return ArrayDataset(np.ascontiguousarray(x), np.concatenate(ys).astype(np.int32))


def load_cifar(path: str | Path, num_classes: int = 100, split: str = "train"):
    """Load CIFAR-10/100 from the standard python-pickle layout under
    ``path`` (accepts the directory itself, its parent, or the .tar.gz)."""
    path = Path(path)
    sub = "cifar-100-python" if num_classes == 100 else "cifar-10-batches-py"
    if path.name.endswith(".tar.gz"):
        out = path.parent
        if not (out / sub).exists():
            with tarfile.open(path) as tf:
                tf.extractall(out)
        path = out
    root = path if path.name == sub else path / sub
    if not root.exists():
        raise FileNotFoundError(f"no CIFAR data at {root}")
    if num_classes == 100:
        names = ["train"] if split == "train" else ["test"]
        return _cifar_batches(root, names, b"fine_labels")
    names = (
        [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
    )
    return _cifar_batches(root, names, b"labels")


def _npz_dataset(path: Path, split: str) -> ArrayDataset:
    d = np.load(path / f"{split}.npz")
    return ArrayDataset(d["images"], d["labels"].astype(np.int32))


def _resolve_split_dir(path: Path, split: str) -> Path | None:
    """Find the on-disk directory for ``split`` (accepts val/test aliases)."""
    aliases = {"train": ["train"], "val": ["val", "test", "validation"],
               "test": ["test", "val", "validation"]}
    for s in aliases.get(split, [split]):
        if (path / s).is_dir():
            return path / s
    return None


def get_dataset(path: str | Path | None, split: str = "train", name: str | None = None):
    """Resolve a dataset by path — packed memmap dumps, ImageFolder trees
    (ImageNet/TinyImageNet layouts), NPZ dumps, CIFAR pickle dirs — or fall
    back to synthetic (ref omega.dataset.get_dataset; the ImageFolder path is
    the reference's ``datasets.imagenet_train_dataset`` intent,
    ref CIFAR100.py:18-21)."""
    if path is not None:
        path = Path(path)
        split_dir = _resolve_split_dir(path, split)
        if split_dir is not None and (split_dir / "meta.json").exists():
            from .train.image_data import PackedDataset

            return PackedDataset(split_dir)
        if (path / "meta.json").exists() and (path / "images.npy").exists():
            from .train.image_data import PackedDataset

            return PackedDataset(path)
        if split_dir is not None and not (split_dir.parent / f"{split}.npz").exists():
            from .train.image_data import ImageFolderDataset

            try:
                return ImageFolderDataset(split_dir)
            except FileNotFoundError:
                pass
        if (path / f"{split}.npz").exists():
            return _npz_dataset(path, split)
        for k in (100, 10):
            try:
                return load_cifar(path, num_classes=k, split=split)
            except FileNotFoundError:
                pass
    classes, size = NAME_TO_CLASS.get(name or "synthetic", (100, 32))
    return synthetic_dataset(
        num_samples=2048 if split == "train" else 512,
        image_size=size,
        num_classes=classes,
        seed=0 if split == "train" else 1,
    )


def imagenet_train_dataset(path: str | Path | None = None) -> ArrayDataset:
    """(ref examples/CIFAR100.py:18-21 — the missing ``datasets`` module's
    intended constructor.)"""
    return get_dataset(path, "train", name="ImageNet")


def imagenet_val_dataset(path: str | Path | None = None) -> ArrayDataset:
    """(ref examples/CIFAR100.py:43-46.)"""
    return get_dataset(path, "val", name="ImageNet")
