"""T2T-ViT — Tokens-to-Token progressive tokenization (ref t2t.py).

Each T2T stage unfolds overlapping patches (kernel k, stride s, padding s//2)
and runs a 1-head transformer at the raw patch dimension; the final stage
projects to ``dim`` and a standard ViT trunk follows (ref t2t.py:32-126).
The reference imports ``Transformer`` from the (replaced) vit.py — broken
upstream (SURVEY.md §8 landmine 2); the intended lucidrains transformer is
used here.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Transformer

__all__ = ["T2TViT"]


def conv_output_size(size, kernel, stride, padding):
    """(ref t2t.py:17-18.)"""
    return int((size - kernel + 2 * padding) / stride + 1)


def _unfold(x, kernel, stride, padding):
    """torch.nn.Unfold equivalent on NHWC → [B, N, C·k·k] (c-major feature
    order, matching torch)."""
    b, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kernel, kernel),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H', W', C*k*k] with feature order (c, kh, kw)
    bh, oh, ow, f = patches.shape
    return patches.reshape(b, oh * ow, f)


class T2TViT(nn.Module):
    image_size: int
    num_classes: int
    dim: int
    depth: Optional[int] = None
    heads: Optional[int] = None
    mlp_dim: Optional[int] = None
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    t2t_layers: Sequence[Sequence[int]] = ((7, 4), (3, 2), (3, 2))
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        if self.pool not in ("cls", "mean"):
            raise ValueError("pool type must be either cls or mean")
        x = img
        layer_dim = self.channels
        size = self.image_size
        for i, (kernel, stride) in enumerate(self.t2t_layers):
            layer_dim *= kernel**2
            is_last = i == len(self.t2t_layers) - 1
            if i > 0:
                side = int(math.sqrt(x.shape[1]))
                x = x.reshape(x.shape[0], side, side, x.shape[-1])
            x = _unfold(x, kernel, stride, stride // 2)
            size = conv_output_size(size, kernel, stride, stride // 2)
            if not is_last:
                x = Transformer(
                    layer_dim, 1, 1, layer_dim, layer_dim,
                    dropout=self.dropout, robust=self.robust, final_norm=False,
                    out_bias=True, dtype=self.dtype,
                    name=f"t2t_transformer_{i}",
                )(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)

        b, n, _ = x.shape
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, size**2 + 1, self.dim)
        )
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, robust=self.robust, final_norm=False,
            out_bias=True, dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
