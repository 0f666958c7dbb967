"""Input pipeline: host-side batching + device-side fused augmentation.

The reference's data path is FFCV (compiled loader, device-side decode +
augmentation at strengths 0-3, ref omega.transforms / omega.ffcv usage in
SURVEY.md §2.4). TPU-native equivalent: a simple sharded host loader feeding
uint8 batches, with ALL augmentation fused into one jitted device stage —
noise injection, crop, flip, color jitter, normalization — so robustness
sweeps never bounce through host (BASELINE.json north star). Per-sample
determinism via ``jax.random.fold_in(key, sample_index)``.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ArrayDataset",
    "DataLoader",
    "augment_batch",
    "make_loader",
    "prefetch_to_device",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]


def make_loader(
    dataset,
    batch_size: int,
    *,
    train: bool = True,
    image_size: int | None = None,
    seed: int = 0,
    shard: tuple[int, int] | None = None,
    num_workers: int = 8,
    indices=None,
):
    """Loader dispatch: decoded-on-the-fly ``ImageFolderLoader`` for
    ``ImageFolderDataset``; in-memory/memmap ``DataLoader`` otherwise.

    ``batch_size`` is the GLOBAL batch (the reference's ``--batch-size``
    semantics: per-device = global/world, ref CIFAR100.py:22-39). ``shard``
    defaults to this process's (index, count) — single-process runs get
    (0, 1); under ``jax.distributed`` each host reads a disjoint slice and
    yields ``batch_size // process_count`` samples per step (the FFCV
    world_size sharding role, ref randomlabel.py:72-77).
    """
    from .image_data import ImageFolderDataset, ImageFolderLoader

    if shard is None:
        import jax

        shard = (jax.process_index(), jax.process_count())
    if shard[1] > 1:
        if batch_size % shard[1]:
            raise ValueError(
                f"global batch {batch_size} not divisible by process count {shard[1]}"
            )
        batch_size //= shard[1]
    if isinstance(dataset, ImageFolderDataset):
        return ImageFolderLoader(
            dataset,
            batch_size,
            image_size=image_size or 224,
            train=train,
            seed=seed,
            shard=shard,
            num_workers=num_workers,
            indices=indices,
        )
    rank, world = shard
    base = np.arange(len(dataset)) if indices is None else np.asarray(indices)
    if world > 1:
        # per-epoch reshuffling happens inside DataLoader over the given
        # indices; shard by static stride so shards stay disjoint
        base = base[rank::world]
    return DataLoader(
        dataset,
        batch_size,
        shuffle=train,
        seed=seed,
        indices=base,
        drop_last=train,
    )


def prefetch_to_device(iterator, sharding, size: int = 2):
    """Wrap a host batch iterator with a ``size``-deep device-put lookahead:
    the next batch's H2D transfer overlaps the current step's execution
    (device_put is async). The FFCV loader the reference relies on does the
    same overlap with CUDA streams (SURVEY.md §2.4)."""
    import collections

    queue = collections.deque()

    def put(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class ArrayDataset:
    """In-memory dataset of uint8 NHWC images + integer labels."""

    def __init__(self, images: np.ndarray, labels: np.ndarray):
        assert len(images) == len(labels)
        self.images = images
        self.labels = labels

    def __len__(self):
        return len(self.images)


class DataLoader:
    """Sharded, seeded, drop-last host loader (static batch shapes for XLA).

    Replaces ``omega.ffcv.train_reader``'s role (SURVEY.md §2.4): per-epoch
    deterministic shuffling (``set_epoch`` = the DistributedSampler pattern of
    ref CIFAR100.py:22-39), optional index subsetting (``indices`` — the DIET
    subsetting of ref simpler_randomlabel.py:44-57), and sample indices
    carried in the batch for instance-label objectives and per-sample RNG.
    """

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        indices: np.ndarray | None = None,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.indices = (
            np.arange(len(dataset)) if indices is None else np.asarray(indices)
        )
        self.drop_last = drop_last

    @property
    def num_samples(self):
        return len(self.indices)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        order = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100003 + self.epoch)
            order = rng.permutation(order)
        nb = len(self)
        for i in range(nb):
            sel = order[i * self.batch_size : (i + 1) * self.batch_size]
            yield {
                "image": self.dataset.images[sel],
                "label": self.dataset.labels[sel],
                "index": sel.astype(np.int32),
            }


def _rand_uniform(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


@functools.partial(
    jax.jit, static_argnames=("strength", "train", "noise_std", "mean", "std")
)
def augment_batch(
    key: jax.Array,
    images_u8: jax.Array,
    *,
    strength: int = 0,
    train: bool = True,
    noise_std: float = 0.0,
    mean: tuple = IMAGENET_MEAN,
    std: tuple = IMAGENET_STD,
) -> jax.Array:
    """Fused device-side augment+normalize stage, one XLA program.

    Strength policy table (the reference's 0-3 augmentation strengths,
    ref omega.transforms usage in evaluation.py:28-43):
      0: random crop (pad-4 for small images) + horizontal flip
      1: + brightness/contrast jitter (±0.2)
      2: + stronger jitter (±0.4) and random grayscale (p=0.2)
      3: + strongest jitter (±0.6), grayscale (p=0.3), channel scaling

    ``noise_std`` adds Gaussian input noise AFTER normalization — the
    noise-robustness training/eval knob (ref examples/nowak.py:153:
    ``x + randn_like(x) * noise_std``). Deterministic per call-site key.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    k_crop, k_flip, k_br, k_ct, k_gray, k_chan, k_noise = jax.random.split(key, 7)

    if train:
        # random shift crop: pad by 4 (small images) and roll per sample
        pad = 4
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        oy = jax.random.randint(k_crop, (b,), 0, 2 * pad + 1)
        ox = jax.random.randint(jax.random.fold_in(k_crop, 1), (b,), 0, 2 * pad + 1)

        def crop_one(img, y0, x0):
            return jax.lax.dynamic_slice(img, (y0, x0, 0), (h, w, c))

        x = jax.vmap(crop_one)(xp, oy, ox)
        # horizontal flip
        flip = jax.random.bernoulli(k_flip, 0.5, (b, 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)

        if strength >= 1:
            amt = {1: 0.2, 2: 0.4, 3: 0.6}[min(strength, 3)]
            bright = _rand_uniform(k_br, (b, 1, 1, 1), 1 - amt, 1 + amt)
            contrast = _rand_uniform(k_ct, (b, 1, 1, 1), 1 - amt, 1 + amt)
            mean_pix = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            x = (x - mean_pix) * contrast + mean_pix * bright
        if strength >= 2:
            p_gray = 0.2 if strength == 2 else 0.3
            gray = jnp.mean(x, axis=-1, keepdims=True)
            use_gray = jax.random.bernoulli(k_gray, p_gray, (b, 1, 1, 1))
            x = jnp.where(use_gray, gray, x)
        if strength >= 3:
            chan = _rand_uniform(k_chan, (b, 1, 1, c), 0.7, 1.3)
            x = x * chan
        x = jnp.clip(x, 0.0, 1.0)

    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    if noise_std:
        x = x + jax.random.normal(k_noise, x.shape) * noise_std
    return x
