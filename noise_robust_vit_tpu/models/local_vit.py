"""LocalViT — ViT with depthwise-conv (locality) feedforward
(ref local_vit.py): standard CLS-token ViT whose FFN is
1×1 conv → Hardswish → depthwise 3×3 → Hardswish → 1×1 conv applied on the
patch grid, with the CLS token excluded from the FFN (ref local_vit.py:
19-27 ``ExcludeCLS``, :52-68)."""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import pair
from .layers import Attention

__all__ = ["LocalViT"]


class _LocalFF(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        side = int(math.sqrt(n))
        y = x.reshape(b, side, side, c)
        y = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype, name="fc1")(y)
        y = nn.hard_swish(y)
        y = nn.Conv(
            self.hidden_dim, (3, 3), padding=1,
            feature_group_count=self.hidden_dim, dtype=self.dtype, name="dw",
        )(y)
        y = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype, name="dw_pw")(y)
        y = nn.hard_swish(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y.reshape(b, n, self.dim)


class LocalViT(nn.Module):
    """(ref local_vit.py:120-154.)"""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        b, h, w, c = img.shape
        ph, pw = pair(self.patch_size)
        x = img.reshape(b, h // ph, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ph * pw * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        n = x.shape[1]
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, n + 1, self.dim)
        )
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        for i in range(self.depth):
            x = Attention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, robust=self.robust, out_bias=True,
                dtype=self.dtype, name=f"layers_{i}_attn",
            )(x, deterministic=deterministic) + x
            # FFN excludes the CLS token (ref :19-27)
            cls_t, patches = x[:, :1], x[:, 1:]
            pn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_ff_norm")(patches)
            patches = patches + _LocalFF(
                self.dim, self.mlp_dim, self.dropout, dtype=self.dtype,
                name=f"layers_{i}_ff",
            )(pn, deterministic=deterministic)
            x = jnp.concatenate([cls_t, patches], axis=1)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
