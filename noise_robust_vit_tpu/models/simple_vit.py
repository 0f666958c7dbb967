"""SimpleViT (Beyer et al., "Better plain ViT baselines") — the flagship
robust model of the reference (exported at ref __init__.py:1; implementation
ref simple_vit.py:100-149).

2D sincos positional embedding, mean pooling, no CLS token / dropout.
``robust=True`` switches every attention to Sinkhorn normalization
(ref simple_vit.py:56-59). Constructor kwargs match the reference signature
(ref simple_vit.py:101-114). Input is NHWC.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops import posemb_sincos_2d
from ..utils import pair
from .layers import PatchEmbed, Transformer

__all__ = ["SimpleViT"]


class SimpleViT(nn.Module):
    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    robust: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        if ih % ph or iw % pw:
            raise ValueError("Image dimensions must be divisible by the patch size.")
        self.grid = (ih // ph, iw // pw)
        self.to_patch_embedding = PatchEmbed(
            self.dim, (ph, pw), flatten=True, dtype=self.dtype
        )
        self.transformer = Transformer(
            self.dim,
            self.depth,
            self.heads,
            self.dim_head,
            self.mlp_dim,
            robust=self.robust,
            dtype=self.dtype,
        )
        self.head_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.linear_head = nn.Dense(self.num_classes, dtype=self.dtype)

    def __call__(self, img, *, deterministic: bool = True, return_features: bool = False):
        x = self.to_patch_embedding(img)
        pe = posemb_sincos_2d(self.grid[0], self.grid[1], self.dim, dtype=x.dtype)
        x = x + pe[None]
        x = self.transformer(x, deterministic=deterministic)
        if return_features == "tokens":
            # per-patch token features (EsViT region loss, ref es_vit.py:207-219)
            return x
        x = jnp.mean(x, axis=1)
        x = self.head_norm(x)
        if return_features:
            # pre-head pooled features (functional replacement for the
            # reference's forward hooks, ref dino.py:120-180)
            return x
        return self.linear_head(x)
