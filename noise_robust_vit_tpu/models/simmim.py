"""SimMIM — simple masked image modeling (ref simmim.py).

Masks ``masking_ratio`` of patches by REPLACING their embeddings with a
learned mask token (+posemb), runs the FULL sequence through the encoder's
transformer, and L1-reconstructs the masked patches' raw pixels through a
linear head; the loss is additionally divided by the masked count exactly as
the reference does (ref simmim.py:29-84).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import pair
from .vit import ViT

__all__ = ["SimMIM"]


class SimMIM(nn.Module):
    encoder: ViT
    masking_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        if not 0.0 < self.masking_ratio < 1.0:
            raise ValueError("masking ratio must be kept between 0 and 1")
        enc = self.encoder
        ph, pw = pair(enc.patch_size)
        b, h, w, c = img.shape
        patches = img.reshape(b, h // ph, ph, w // pw, pw, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ph * pw * c)
        num_patches = patches.shape[1]

        pos = enc.pos_embedding[:, 1 : num_patches + 1]
        tokens = enc.patchify_tokens(img) + pos.astype(self.dtype)

        mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (tokens.shape[-1],)
        )
        mask_tokens = (
            jnp.broadcast_to(mask_token.astype(tokens.dtype), tokens.shape)
            + pos.astype(tokens.dtype)
        )

        num_masked = int(self.masking_ratio * num_patches)
        key = self.make_rng("mask") if not deterministic else jax.random.PRNGKey(0)
        rand = jax.random.uniform(key, (b, num_patches))
        _, masked_indices = jax.lax.top_k(rand, num_masked)
        bool_mask = jnp.zeros((b, num_patches), bool)
        bool_mask = bool_mask.at[jnp.arange(b)[:, None], masked_indices].set(True)

        tokens = jnp.where(bool_mask[..., None], mask_tokens, tokens)
        encoded = enc.forward_tokens(tokens, deterministic=deterministic)

        encoded_masked = jnp.take_along_axis(
            encoded, masked_indices[..., None], axis=1
        )
        pred = nn.Dense(ph * pw * c, dtype=self.dtype, name="to_pixels")(encoded_masked)
        target = jnp.take_along_axis(patches, masked_indices[..., None], axis=1)
        l1 = jnp.mean(
            jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
        )
        # reference divides the mean L1 by num_masked again (simmim.py:83)
        return l1 / num_masked
