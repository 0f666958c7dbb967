"""MPP — Masked Patch Prediction, BERT-style pretraining (ref mpp.py).

Each patch is, with probability ``mask_prob``, selected for prediction; a
selected patch is replaced by the learned mask token (prob ``replace_prob``),
swapped for a random other patch of the same image (prob
``random_patch_prob``), or kept. The transformer then classifies each masked
position's MEAN RGB discretized to ``output_channel_bits`` bins per channel
(ref mpp.py:33-74 ``MPPLoss``, :79-172 ``MPP``).

Selection count is static (``max(1, round(mask_prob·N))`` via top-k of
uniform scores) and the loss is a mask-weighted mean — boolean fancy
indexing is replaced by static-shape arithmetic for XLA.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..utils import pair
from .vit import ViT

__all__ = ["MPP", "mpp_loss"]


def mpp_loss(
    logits: jax.Array,
    img: jax.Array,
    mask: jax.Array,
    patch_size: int,
    channels: int = 3,
    output_channel_bits: int = 3,
    max_pixel_val: float = 1.0,
    mean: Sequence[float] | None = None,
    std: Sequence[float] | None = None,
) -> jax.Array:
    """(ref mpp.py:33-74.) ``logits`` [B,N,2^(bits·c)], ``img`` NHWC,
    ``mask`` [B,N] bool of predicted positions."""
    p = patch_size
    if mean is not None and std is not None:
        img = img * jnp.asarray(std) + jnp.asarray(mean)
    img = jnp.clip(img, None, max_pixel_val)
    b, h, w, c = img.shape
    avg = img.reshape(b, h // p, p, w // p, p, c).mean(axis=(2, 4))
    avg = avg.reshape(b, -1, c)  # [B, N, C]
    bin_size = max_pixel_val / (2**output_channel_bits)
    bins = jnp.arange(bin_size, max_pixel_val, bin_size)
    disc = jnp.searchsorted(bins, avg, side="right")
    weights = (2**output_channel_bits) ** jnp.arange(c)
    target = jnp.sum(disc * weights[None, None, :], axis=-1)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), target
    )
    maskf = mask.astype(jnp.float32)
    return jnp.sum(ce * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)


class MPP(nn.Module):
    transformer: ViT
    patch_size: int
    dim: int
    output_channel_bits: int = 3
    channels: int = 3
    max_pixel_val: float = 1.0
    mask_prob: float = 0.15
    replace_prob: float = 0.5
    random_patch_prob: float = 0.5
    mean: Sequence[float] | None = None
    std: Sequence[float] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        vit = self.transformer
        patches = vit.raw_patches(img)
        b, n, pd = patches.shape
        key = self.make_rng("mask") if not deterministic else jax.random.PRNGKey(0)
        k_sel, k_rand_gate, k_rand_idx, k_repl = jax.random.split(key, 4)

        # select ~mask_prob of patches (static count via top-k)
        num_sel = max(1, int(round(self.mask_prob * n)))
        scores = jax.random.uniform(k_sel, (b, n))
        _, sel_idx = jax.lax.top_k(scores, num_sel)
        mask = jnp.zeros((b, n), bool).at[jnp.arange(b)[:, None], sel_idx].set(True)

        masked_input = patches
        if self.random_patch_prob > 0:
            rps_prob = self.random_patch_prob / (1 - self.replace_prob)
            rand_gate = jax.random.bernoulli(k_rand_gate, rps_prob, (b, n))
            rand_patches = jax.random.randint(k_rand_idx, (b, n), 0, n)
            randomized = jnp.take_along_axis(
                masked_input, rand_patches[..., None], axis=1
            )
            use_rand = (mask & rand_gate)[..., None]
            masked_input = jnp.where(use_rand, randomized, masked_input)

        mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (1, 1, pd)
        )
        replace = jax.random.bernoulli(k_repl, self.replace_prob, (b, n))
        use_tok = (mask & replace)[..., None]
        masked_input = jnp.where(use_tok, mask_token.astype(masked_input.dtype), masked_input)

        x = vit.embed_patches(masked_input)
        cls = jnp.broadcast_to(vit.cls_token.astype(x.dtype), (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vit.pos_embedding[:, : n + 1].astype(x.dtype)
        x = vit.emb_drop(x, deterministic=deterministic)
        x = vit.forward_tokens(x, deterministic=deterministic)

        logits = nn.Dense(
            2 ** (self.output_channel_bits * self.channels),
            dtype=self.dtype,
            name="to_bits",
        )(x)[:, 1:]

        return mpp_loss(
            logits, img, mask, self.patch_size, self.channels,
            self.output_channel_bits, self.max_pixel_val, self.mean, self.std,
        )
