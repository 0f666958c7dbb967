"""CCT — Compact Convolutional Transformer (+3D variant) (ref cct.py,
cct_3d.py).

Conv tokenizer (n conv-ReLU-maxpool layers, ref cct.py:162-206), transformer
encoder with sinusoidal/learnable/no positional embedding and stochastic
depth (ref cct.py:209-303), and SEQUENCE POOLING head — a learned softmax
attention over tokens instead of a CLS token (ref cct.py:286-290). Builders
``cct_2/4/6/7/8/14/16`` (ref cct.py:23-58).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import gelu

from .layers import Attention, DropPath

__all__ = [
    "CCT",
    "CCT3D",
    "cct_2",
    "cct_4",
    "cct_6",
    "cct_7",
    "cct_8",
    "cct_14",
    "cct_16",
]


def sinusoidal_embedding(n: int, dim: int) -> np.ndarray:
    """(ref cct.py:14-20.)"""
    pe = np.array(
        [[p / (10000 ** (2 * (i // 2) / dim)) for i in range(dim)] for p in range(n)],
        np.float32,
    )
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe[None]


class _TransformerClassifier(nn.Module):
    """(ref cct.py:209-303.)"""

    sequence_length: int
    embedding_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    dropout_rate: float = 0.1
    attention_dropout: float = 0.1
    stochastic_depth_rate: float = 0.1
    positional_embedding: str = "sine"
    seq_pool: bool = True
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, d = x.shape
        seq_len = self.sequence_length
        if not self.seq_pool:
            cls = self.param(
                "class_emb", nn.initializers.zeros, (1, 1, self.embedding_dim)
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, d)), x], axis=1
            )
            seq_len += 1
        if self.positional_embedding == "learnable":
            pos = self.param(
                "positional_emb",
                nn.initializers.truncated_normal(0.2),
                (1, seq_len, self.embedding_dim),
            )
            x = x + pos.astype(x.dtype)
        elif self.positional_embedding == "sine":
            x = x + jnp.asarray(
                sinusoidal_embedding(seq_len, self.embedding_dim)
            ).astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, self.stochastic_depth_rate, self.num_layers)
        hidden = int(self.embedding_dim * self.mlp_ratio)
        for i in range(self.num_layers):
            sd = DropPath(float(dpr[i]))
            a = Attention(
                self.embedding_dim, heads=self.num_heads,
                dim_head=self.embedding_dim // self.num_heads,
                dropout=self.attention_dropout, robust=self.robust,
                qkv_bias=False, out_bias=True, dtype=self.dtype,
                name=f"block{i}_attn",
            )(x, deterministic=deterministic)
            x = x + sd(a, deterministic=deterministic)
            # ref cct.py:137-141: norm1 is applied IN the residual stream
            # after attention — the MLP's residual base is the NORMALIZED x
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"block{i}_norm2")(x)
            f = nn.Dense(hidden, dtype=self.dtype, name=f"block{i}_fc1")(x)
            f = gelu(f)
            f = nn.Dropout(self.dropout_rate)(f, deterministic=deterministic)
            f = nn.Dense(self.embedding_dim, dtype=self.dtype, name=f"block{i}_fc2")(f)
            f = nn.Dropout(self.dropout_rate)(f, deterministic=deterministic)
            x = x + sd(f, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        if self.seq_pool:
            # learned attention pooling (ref cct.py:286-290)
            w = nn.Dense(1, dtype=self.dtype, name="attention_pool")(x)
            w = jax.nn.softmax(w, axis=1)
            x = jnp.einsum("bn1,bnd->bd", w, x)
        else:
            x = x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


class CCT(nn.Module):
    """(ref cct.py:306-350.)"""

    img_size: Any = 224
    embedding_dim: int = 768
    n_input_channels: int = 3
    n_conv_layers: int = 1
    kernel_size: int = 7
    stride: int = 2
    padding: int = 3
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    pooling_padding: int = 1
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    positional_embedding: str = "sine"
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_planes = 64
        chans = (
            [self.n_input_channels]
            + [in_planes] * (self.n_conv_layers - 1)
            + [self.embedding_dim]
        )
        for i, (ci, co) in enumerate(zip(chans[:-1], chans[1:])):
            x = nn.Conv(
                co, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding=self.padding,
                use_bias=False, dtype=self.dtype, name=f"tok_conv{i}",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (self.pooling_kernel_size, self.pooling_kernel_size),
                strides=(self.pooling_stride, self.pooling_stride),
                padding=((self.pooling_padding, self.pooling_padding),) * 2,
            )
        b = x.shape[0]
        seq_len = x.shape[1] * x.shape[2]
        x = x.reshape(b, seq_len, self.embedding_dim)
        return _TransformerClassifier(
            sequence_length=seq_len,
            embedding_dim=self.embedding_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            num_classes=self.num_classes,
            dropout_rate=0.0,
            attention_dropout=0.1,
            stochastic_depth_rate=0.1,
            positional_embedding=self.positional_embedding,
            robust=self.robust,
            dtype=self.dtype,
            name="classifier",
        )(x, deterministic=deterministic)


class CCT3D(nn.Module):
    """3D (video) CCT with a Conv3D tokenizer (ref cct_3d.py:317-376).
    Input [B, F, H, W, C]."""

    img_size: Any = 224
    num_frames: int = 8
    embedding_dim: int = 768
    n_input_channels: int = 3
    n_conv_layers: int = 1
    kernel_size: int = 7
    stride: int = 2
    padding: int = 3
    frame_kernel_size: int = 3
    frame_stride: int = 1
    frame_padding: int = 1
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    pooling_padding: int = 1
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    positional_embedding: str = "sine"
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_planes = 64
        chans = (
            [self.n_input_channels]
            + [in_planes] * (self.n_conv_layers - 1)
            + [self.embedding_dim]
        )
        for i, (ci, co) in enumerate(zip(chans[:-1], chans[1:])):
            x = nn.Conv(
                co,
                (self.frame_kernel_size, self.kernel_size, self.kernel_size),
                strides=(self.frame_stride, self.stride, self.stride),
                padding=(
                    (self.frame_padding, self.frame_padding),
                    (self.padding, self.padding),
                    (self.padding, self.padding),
                ),
                use_bias=False, dtype=self.dtype, name=f"tok_conv{i}",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x,
                (1, self.pooling_kernel_size, self.pooling_kernel_size),
                strides=(1, self.pooling_stride, self.pooling_stride),
                padding=((0, 0),) + ((self.pooling_padding, self.pooling_padding),) * 2,
            )
        b = x.shape[0]
        seq_len = x.shape[1] * x.shape[2] * x.shape[3]
        x = x.reshape(b, seq_len, self.embedding_dim)
        return _TransformerClassifier(
            sequence_length=seq_len,
            embedding_dim=self.embedding_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            num_classes=self.num_classes,
            positional_embedding=self.positional_embedding,
            robust=self.robust,
            dtype=self.dtype,
            name="classifier",
        )(x, deterministic=deterministic)


def _cct(num_layers, num_heads, mlp_ratio, embedding_dim, kernel_size=3,
         stride=None, padding=None, **kw):
    """(ref cct.py:59-76.)"""
    stride = stride if stride is not None else max(1, (kernel_size // 2) - 1)
    padding = padding if padding is not None else max(1, (kernel_size // 2))
    return CCT(
        num_layers=num_layers, num_heads=num_heads, mlp_ratio=mlp_ratio,
        embedding_dim=embedding_dim, kernel_size=kernel_size, stride=stride,
        padding=padding, **kw,
    )


def _builder(layers, heads, ratio, dim):
    def build(*args, num_classes=1000, image_size=224, robust=False,
              dtype=jnp.float32, **kw):
        return _cct(layers, heads, ratio, dim, num_classes=num_classes,
                    img_size=image_size, robust=robust, dtype=dtype, **kw)

    return build


cct_2 = _builder(2, 2, 1, 128)
cct_4 = _builder(4, 2, 1, 128)
cct_6 = _builder(6, 4, 2, 256)
cct_7 = _builder(7, 4, 2, 256)
cct_8 = _builder(8, 4, 2, 256)
cct_14 = _builder(14, 6, 3, 384)
cct_16 = _builder(16, 6, 3, 384)
