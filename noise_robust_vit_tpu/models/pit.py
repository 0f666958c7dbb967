"""PiT — Pooling-based Vision Transformer (ref pit.py).

Overlapping-patch Unfold tokenization (stride = patch//2, ref pit.py:144-148),
then per-stage transformers separated by ``Pool`` layers: a depthwise-conv
stride-2 spatial downsample of the patch tokens plus a linear dim-doubling of
the CLS token (ref pit.py:102-118)."""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import to_ntuple
from .layers import Transformer
from .t2t import _unfold, conv_output_size

__all__ = ["PiT"]


class _Pool(nn.Module):
    """(ref pit.py:102-118.)"""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cls, tokens = x[:, :1], x[:, 1:]
        cls = nn.Dense(self.dim * 2, dtype=self.dtype, name="cls_ff")(cls)
        b, n, c = tokens.shape
        side = int(math.sqrt(n))
        t = tokens.reshape(b, side, side, c)
        # depthwise 3x3 stride 2 with channel multiplier 2 (out = dim*2,
        # groups = dim) + 1x1 projection (ref pit.py:88-98)
        t = nn.Conv(
            self.dim * 2, (3, 3), strides=(2, 2), padding=1,
            feature_group_count=c, dtype=self.dtype, name="dw",
        )(t)
        t = nn.Conv(self.dim * 2, (1, 1), dtype=self.dtype, name="pw")(t)
        t = t.reshape(b, -1, self.dim * 2)
        return jnp.concatenate([cls, t], axis=1)


class PiT(nn.Module):
    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: Sequence[int]
    heads: Any
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    channels: int = 3
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        if not isinstance(self.depth, (tuple, list)):
            raise ValueError("depth must be a tuple of integers")
        heads = to_ntuple(len(self.depth))(self.heads)
        p = self.patch_size
        x = _unfold(img, p, p // 2, 0)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)

        out_size = conv_output_size(self.image_size, p, p // 2, 0)
        b, n, _ = x.shape
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, out_size**2 + 1, self.dim),
        )
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        dim = self.dim
        for ind, (layer_depth, layer_heads) in enumerate(zip(self.depth, heads)):
            x = Transformer(
                dim, layer_depth, layer_heads, self.dim_head, self.mlp_dim,
                dropout=self.dropout, robust=self.robust, out_bias=True,
                dtype=self.dtype, name=f"stage{ind}",
            )(x, deterministic=deterministic)
            if ind < len(self.depth) - 1:
                x = _Pool(dim, dtype=self.dtype, name=f"pool{ind}")(x)
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
