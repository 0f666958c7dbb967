"""CrossViT — dual-branch small/large-patch ViT with cross-attention CLS
exchange (ref cross_vit.py).

Two patch embedders at different patch sizes; per multi-scale layer each
branch runs its own transformer, then each branch's CLS cross-attends to the
OTHER branch's patch tokens (projected in/out between dims, kv including the
CLS itself — ref cross_vit.py:90-137). Heads: sum of both branches' logits
(ref cross_vit.py:262-273)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import pair
from .layers import Attention, Transformer

__all__ = ["CrossViT"]


class _ImageEmbedder(nn.Module):
    """(ref cross_vit.py:173-204.)"""

    dim: int
    image_size: int
    patch_size: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        b, h, w, c = img.shape
        p = self.patch_size
        x = img.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p * p * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)
        n = x.shape[1]
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, n + 1, self.dim)
        )
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = x + pos[:, : n + 1].astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class _CrossTransformer(nn.Module):
    """(ref cross_vit.py:118-137.) CLS of each branch attends to the other
    branch's patch tokens (kv includes the projected CLS itself)."""

    sm_dim: int
    lg_dim: int
    depth: int
    heads: int
    dim_head: int
    dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sm_tokens, lg_tokens, *, deterministic: bool = True):
        sm_cls, sm_patch = sm_tokens[:, :1], sm_tokens[:, 1:]
        lg_cls, lg_patch = lg_tokens[:, :1], lg_tokens[:, 1:]
        for i in range(self.depth):
            # small CLS attends large patches (project sm→lg, attend, lg→sm)
            q = nn.Dense(self.lg_dim, dtype=self.dtype, name=f"l{i}_sm_in")(sm_cls)
            ctx = jnp.concatenate([q, lg_patch], axis=1)
            out = Attention(
                self.lg_dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, robust=self.robust, out_bias=True, dtype=self.dtype,
                name=f"l{i}_sm_attend_lg",
            )(q, context=ctx, deterministic=deterministic)
            sm_cls = sm_cls + nn.Dense(
                self.sm_dim, dtype=self.dtype, name=f"l{i}_sm_out"
            )(out)
            # large CLS attends small patches
            q = nn.Dense(self.sm_dim, dtype=self.dtype, name=f"l{i}_lg_in")(lg_cls)
            ctx = jnp.concatenate([q, sm_patch], axis=1)
            out = Attention(
                self.sm_dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, robust=self.robust, out_bias=True, dtype=self.dtype,
                name=f"l{i}_lg_attend_sm",
            )(q, context=ctx, deterministic=deterministic)
            lg_cls = lg_cls + nn.Dense(
                self.lg_dim, dtype=self.dtype, name=f"l{i}_lg_out"
            )(out)
        return (
            jnp.concatenate([sm_cls, sm_patch], axis=1),
            jnp.concatenate([lg_cls, lg_patch], axis=1),
        )


class CrossViT(nn.Module):
    image_size: int
    num_classes: int
    sm_dim: int
    lg_dim: int
    sm_patch_size: int = 12
    sm_enc_depth: int = 1
    sm_enc_heads: int = 8
    sm_enc_mlp_dim: int = 2048
    sm_enc_dim_head: int = 64
    lg_patch_size: int = 16
    lg_enc_depth: int = 4
    lg_enc_heads: int = 8
    lg_enc_mlp_dim: int = 2048
    lg_enc_dim_head: int = 64
    cross_attn_depth: int = 2
    cross_attn_heads: int = 8
    cross_attn_dim_head: int = 64
    depth: int = 3
    dropout: float = 0.1
    emb_dropout: float = 0.1
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        sm = _ImageEmbedder(
            self.sm_dim, self.image_size, self.sm_patch_size, self.emb_dropout,
            dtype=self.dtype, name="sm_embedder",
        )(img, deterministic=deterministic)
        lg = _ImageEmbedder(
            self.lg_dim, self.image_size, self.lg_patch_size, self.emb_dropout,
            dtype=self.dtype, name="lg_embedder",
        )(img, deterministic=deterministic)

        for d in range(self.depth):
            sm = Transformer(
                self.sm_dim, self.sm_enc_depth, self.sm_enc_heads,
                self.sm_enc_dim_head, self.sm_enc_mlp_dim, dropout=self.dropout,
                robust=self.robust, out_bias=True, dtype=self.dtype, name=f"ms{d}_sm_enc",
            )(sm, deterministic=deterministic)
            lg = Transformer(
                self.lg_dim, self.lg_enc_depth, self.lg_enc_heads,
                self.lg_enc_dim_head, self.lg_enc_mlp_dim, dropout=self.dropout,
                robust=self.robust, out_bias=True, dtype=self.dtype, name=f"ms{d}_lg_enc",
            )(lg, deterministic=deterministic)
            sm, lg = _CrossTransformer(
                self.sm_dim, self.lg_dim, self.cross_attn_depth,
                self.cross_attn_heads, self.cross_attn_dim_head, self.dropout,
                self.robust, dtype=self.dtype, name=f"ms{d}_cross",
            )(sm, lg, deterministic=deterministic)

        sm_cls, lg_cls = sm[:, 0], lg[:, 0]
        sm_logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="sm_head"
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="sm_head_norm")(sm_cls))
        lg_logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="lg_head"
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="lg_head_norm")(lg_cls))
        return sm_logits + lg_logits
