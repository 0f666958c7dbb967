"""MAE — Masked Autoencoder pretraining wrapper (ref mae.py).

Masks ``masking_ratio`` of patches, encodes only the visible tokens with the
wrapped ``ViT``'s transformer, decodes the full sequence with learned mask
tokens + decoder position embeddings, and returns MSE on the masked patches'
raw pixels (ref mae.py:50-118).

The reference requires a lucidrains-style encoder exposing
``pos_embedding / to_patch_embedding / transformer`` (ref mae.py:29-31; this
is broken against the fork's torchvision-style vit.py — SURVEY.md §8
landmine 2). Here the encoder is our ``models.vit.ViT``, which exposes
``patchify_tokens`` / ``forward_tokens`` as shared-parameter methods.

TPU notes: masking uses ``argsort(uniform)`` with a STATIC masked count, and
the token scatter/gather is ``take_along_axis`` / one-hot-free scatter —
static shapes throughout (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import pair
from .layers import Attention, FeedForward
from .vit import ViT

__all__ = ["MAE"]


class MAE(nn.Module):
    encoder: ViT
    decoder_dim: int
    masking_ratio: float = 0.75
    decoder_depth: int = 1
    decoder_heads: int = 8
    decoder_dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        if not 0.0 < self.masking_ratio < 1.0:
            raise ValueError("masking ratio must be kept between 0 and 1")
        enc = self.encoder
        ph, pw = pair(enc.patch_size)
        b, h, w, c = img.shape
        # raw patches (the reconstruction target — pre-embedding pixels)
        patches = img.reshape(b, h // ph, ph, w // pw, pw, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, -1, ph * pw * c
        )
        num_patches = patches.shape[1]

        tokens = enc.patchify_tokens(img)
        # the encoder's learned pos-embedding rows for patch tokens
        # (ref mae.py:62: pos_embedding[:, 1:n+1] — row 0 is the CLS slot)
        tokens = tokens + enc.pos_embedding[:, 1 : num_patches + 1].astype(tokens.dtype)

        num_masked = int(self.masking_ratio * num_patches)
        key = self.make_rng("mask") if not deterministic else jax.random.PRNGKey(0)
        rand = jax.random.uniform(key, (b, num_patches))
        rand_indices = jnp.argsort(rand, axis=-1)
        masked_indices = rand_indices[:, :num_masked]
        unmasked_indices = rand_indices[:, num_masked:]

        tokens_vis = jnp.take_along_axis(
            tokens, unmasked_indices[..., None], axis=1
        )
        masked_patches = jnp.take_along_axis(
            patches, masked_indices[..., None], axis=1
        )

        encoded = enc.forward_tokens(tokens_vis, deterministic=deterministic)

        enc_dim = encoded.shape[-1]
        if enc_dim != self.decoder_dim:
            decoder_tokens_vis = nn.Dense(
                self.decoder_dim, dtype=self.dtype, name="enc_to_dec"
            )(encoded)
        else:
            decoder_tokens_vis = encoded

        mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (self.decoder_dim,)
        )
        decoder_pos = self.param(
            "decoder_pos_emb",
            nn.initializers.normal(1.0),
            (num_patches, self.decoder_dim),
        )
        vis_tok = decoder_tokens_vis + jnp.take(
            decoder_pos, unmasked_indices, axis=0
        ).astype(decoder_tokens_vis.dtype)
        mask_tok = (
            jnp.broadcast_to(
                mask_token.astype(vis_tok.dtype), (b, num_masked, self.decoder_dim)
            )
            + jnp.take(decoder_pos, masked_indices, axis=0).astype(vis_tok.dtype)
        )

        # scatter both sets back into position order (ref mae.py:100-105)
        full = jnp.zeros((b, num_patches, self.decoder_dim), vis_tok.dtype)
        bidx = jnp.arange(b)[:, None]
        full = full.at[bidx, unmasked_indices].set(vis_tok)
        full = full.at[bidx, masked_indices].set(mask_tok)

        x = full
        for i in range(self.decoder_depth):
            x = Attention(
                self.decoder_dim, heads=self.decoder_heads,
                dim_head=self.decoder_dim_head, dtype=self.dtype,
                name=f"decoder_{i}_attn",
            )(x, deterministic=deterministic) + x
            x = FeedForward(
                self.decoder_dim, self.decoder_dim * 4, dtype=self.dtype,
                name=f"decoder_{i}_ff",
            )(x, deterministic=deterministic) + x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")(x)

        decoded_masked = jnp.take_along_axis(x, masked_indices[..., None], axis=1)
        pred = nn.Dense(ph * pw * c, dtype=self.dtype, name="to_pixels")(decoded_masked)
        return jnp.mean((pred.astype(jnp.float32) - masked_patches.astype(jnp.float32)) ** 2)
