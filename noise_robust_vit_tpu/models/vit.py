"""Lucidrains-style ViT — CLS/mean pool, learned posemb, dropout.

The upstream vit-pytorch ``ViT`` that the reference's SSL wrappers (MAE,
SimMIM, MPP, Distill) and introspection tools were written against — the fork
replaced vit.py with a torchvision-style model and broke those imports
(SURVEY.md §8 landmine 2); per the survey, the rebuild keeps BOTH: this
lucidrains-style ``ViT`` (composable: exposes ``patchify_tokens`` /
``forward_tokens`` / ``pos_embedding``) and the torchvision-style
``VisionTransformer`` (vision_transformer.py). ``robust`` threads Sinkhorn
attention through every block, as the fork does for its Group-A models.

Constructor signature matches upstream vit-pytorch
(image_size, patch_size, num_classes, dim, depth, heads, mlp_dim,
pool='cls', channels=3, dim_head=64, dropout=0., emb_dropout=0.).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils import pair, trunc_normal_init
from .layers import Attention, FeedForward

__all__ = ["ViT"]


class ViT(nn.Module):
    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        if ih % ph or iw % pw:
            raise ValueError("Image dimensions must be divisible by the patch size.")
        if self.pool not in ("cls", "mean"):
            raise ValueError("pool type must be either cls or mean")
        self.num_patches = (ih // ph) * (iw // pw)
        # lucidrains patch embedding: Rearrange → LN → Linear → LN
        self.patch_norm_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.patch_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.patch_norm_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.pos_embedding = self.param(
            "pos_embedding", trunc_normal_init(0.02), (1, self.num_patches + 1, self.dim)
        )
        self.cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, self.dim)
        )
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.blocks = [
            (
                Attention(
                    self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    robust=self.robust,
                    # upstream vit-pytorch to_out is a default nn.Linear
                    # (bias=True), unlike the simple_vit family
                    out_bias=True,
                    dtype=self.dtype,
                    name=f"layers_{i}_attn",
                ),
                FeedForward(
                    self.dim,
                    self.mlp_dim,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"layers_{i}_ff",
                ),
            )
            for i in range(self.depth)
        ]
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp_head = nn.Dense(self.num_classes, dtype=self.dtype)

    def raw_patches(self, img):
        """Flattened raw pixel patches [B, N, p·p·c] (the reference's
        ``to_patch`` Rearrange, ref mae.py:56)."""
        b, h, w, c = img.shape
        ph, pw = pair(self.patch_size)
        x = img.reshape(b, h // ph, ph, w // pw, pw, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (h // ph) * (w // pw), ph * pw * c
        )

    def embed_patches(self, patches):
        """Embed pre-flattened patches (the reference's ``patch_to_emb``,
        ref mae.py:60; used by MPP which perturbs raw patches first)."""
        x = self.patch_norm_in(patches)
        x = self.patch_proj(x)
        return self.patch_norm_out(x)

    def patchify_tokens(self, img):
        """Patch tokens BEFORE pos-embedding/CLS — the handle MAE/SimMIM need
        (ref mae.py:29-31 accesses ``to_patch_embedding`` piecewise)."""
        return self.embed_patches(self.raw_patches(img))

    def forward_tokens(self, x, *, deterministic: bool = True):
        """Run the transformer stack on an arbitrary token sequence (used by
        the SSL wrappers, which splice in mask tokens / subsets)."""
        for attn, ff in self.blocks:
            x = attn(x, deterministic=deterministic) + x
            x = ff(x, deterministic=deterministic) + x
            self.sow("intermediates", "block_out", x)
        return self.final_norm(x)

    def __call__(self, img, *, deterministic: bool = True, return_features: bool = False):
        x = self.patchify_tokens(img)
        b, n, _ = x.shape
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding[:, : n + 1].astype(x.dtype)
        x = self.emb_drop(x, deterministic=deterministic)
        x = self.forward_tokens(x, deterministic=deterministic)
        if return_features == "tokens":
            # patch-token features, CLS dropped (EsViT region loss,
            # ref es_vit.py:207-219)
            return x[:, 1:]
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        if return_features:
            return x
        return self.mlp_head(x)
