"""Stochastic regularizers: DropPath, dropout helpers, patch dropout, cutmix.

JAX equivalents of ref vit_pytorch_robust/utils.py:1078-1112 (drop_path /
DropPath), utils.py:1006-1022 (rand_bbox for cutmix), and the patch-dropout
token subsampling of ref vit_with_patch_dropout.py:14-33. All randomness is
explicit-key; cutmix is implemented with a static-shape coordinate mask
instead of dynamic slicing so it stays jit-friendly (SURVEY.md §7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["drop_path", "rand_bbox", "cutmix", "patch_dropout_indices"]


def drop_path(
    x: jax.Array,
    rate: float,
    key: jax.Array | None,
    deterministic: bool = False,
    scale_by_keep: bool = True,
) -> jax.Array:
    """Per-sample stochastic depth (ref utils.py:1078-1097): zero a residual
    branch with probability ``rate`` independently per sample, rescaling the
    survivors by ``1/keep`` so the expectation is unchanged."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape).astype(x.dtype)
    if scale_by_keep:
        mask = mask / keep
    return x * mask


def rand_bbox(key: jax.Array, height: int, width: int, lam: jax.Array):
    """Random cutmix box (ref utils.py:1006-1022): box area ≈ (1-lam) of the
    image, centered uniformly, clipped to bounds. Returns (x1, y1, x2, y2)
    as traced int32 scalars."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (width * cut_rat).astype(jnp.int32)
    cut_h = (height * cut_rat).astype(jnp.int32)
    kx, ky = jax.random.split(key)
    cx = jax.random.randint(kx, (), 0, width)
    cy = jax.random.randint(ky, (), 0, height)
    bbx1 = jnp.clip(cx - cut_w // 2, 0, width)
    bby1 = jnp.clip(cy - cut_h // 2, 0, height)
    bbx2 = jnp.clip(cx + cut_w // 2, 0, width)
    bby2 = jnp.clip(cy + cut_h // 2, 0, height)
    return bbx1, bby1, bbx2, bby2


def cutmix(key: jax.Array, images: jax.Array, labels: jax.Array, beta: float = 1.0):
    """CutMix a batch (ref examples/CIFAR100.py:119-127): paste a random box
    from a shuffled copy of the batch and return the mixed images plus
    ``(labels, permuted labels, lam_adjusted)`` for loss mixing.

    ``images`` is NHWC. The box is applied via a coordinate mask (static
    shapes under jit), and ``lam`` is recomputed from the realized box area
    exactly as the reference does (CIFAR100.py:125-127).
    """
    kperm, klam, kbox = jax.random.split(key, 3)
    b, h, w, _ = images.shape
    perm = jax.random.permutation(kperm, b)
    lam = jax.random.beta(klam, beta, beta)
    x1, y1, x2, y2 = rand_bbox(kbox, h, w, lam)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    box = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)  # [h, w]
    mixed = jnp.where(box[None, :, :, None], images[perm], images)
    lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)) / (h * w)
    return mixed, (labels, labels[perm], lam_adj.astype(images.dtype))


def patch_dropout_indices(key: jax.Array, batch: int, num_tokens: int, keep_prob: float):
    """Per-sample random subset of token indices for patch dropout
    (ref vit_with_patch_dropout.py:14-33). Returns ``[batch, num_kept]``
    int32 indices (unsorted, without replacement)."""
    num_kept = max(1, int(num_tokens * keep_prob))
    keys = jax.random.split(key, batch)

    def one(k):
        return jax.random.permutation(k, num_tokens)[:num_kept]

    return jax.vmap(one)(keys)
