"""Lucidrains zoo — dimensional / regularization / structural ViT variants
(Group B, SURVEY.md §2.2): 1D/3D/video ViTs, patch dropout, patch merger,
parallel branches, small-dataset SPT+LSA, the external-transformer shell, and
the learnable-memory adapter.

Each model keeps the reference constructor signature; a ``robust`` kwarg is
additionally threaded to the shared attention (an extension in the fork's
spirit — these upstream files never got the flag; default off preserves
upstream behavior).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    gelu,
    posemb_sincos_1d,
    posemb_sincos_3d,
    robust_softmax,
)
from ..ops.regularizers import patch_dropout_indices
from ..utils import pair
from .layers import Attention, FeedForward, Transformer

__all__ = [
    "SimpleViT1D",
    "SimpleViT3D",
    "ViT1D",
    "ViT3D",
    "ViViT",
    "ViTWithPatchDropout",
    "SimpleViTWithPatchDropout",
    "PatchMerger",
    "ViTWithPatchMerger",
    "ParallelViT",
    "SmallDatasetViT",
    "EfficientViT",
    "LearnableMemoryViT",
    "Adapter",
]


def _head(x, num_classes, dtype, name="mlp_head"):
    x = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=f"{name}_norm")(x)
    return nn.Dense(num_classes, dtype=dtype, name=f"{name}_fc")(x)


class SimpleViT1D(nn.Module):
    """(ref simple_vit_1d.py:77-113.) Input [B, L, C] (channels-last)."""

    seq_len: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, series, *, deterministic: bool = True):
        b, l, c = series.shape
        p = self.patch_size
        x = series.reshape(b, l // p, p * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        x = x + posemb_sincos_1d(x.shape[1], self.dim, dtype=x.dtype)[None]
        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            robust=self.robust, dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        return _head(jnp.mean(x, axis=1), self.num_classes, self.dtype)


class SimpleViT3D(nn.Module):
    """(ref simple_vit_3d.py:92-141.) Input [B, F, H, W, C]."""

    image_size: Any
    image_patch_size: Any
    frames: int
    frame_patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video, *, deterministic: bool = True):
        b, f, h, w, c = video.shape
        ph, pw = pair(self.image_patch_size)
        pf = self.frame_patch_size
        x = video.reshape(b, f // pf, pf, h // ph, ph, w // pw, pw, c)
        # feature order (p1 p2 pf c) per ref simple_vit_3d.py:105
        x = x.transpose(0, 1, 3, 5, 4, 6, 2, 7).reshape(
            b, (f // pf) * (h // ph) * (w // pw), ph * pw * pf * c
        )
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        pe = posemb_sincos_3d(f // pf, h // ph, w // pw, self.dim, dtype=x.dtype)
        x = x + pe[None]
        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            robust=self.robust, dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        return _head(jnp.mean(x, axis=1), self.num_classes, self.dtype)


class _ClsTokenViTBase(nn.Module):
    """Shared CLS-token + learned-posemb trunk for the 1D/3D lucidrains ViTs."""

    num_classes: int = 10
    dim: int = 64
    depth: int = 2
    heads: int = 4
    mlp_dim: int = 128
    pool: str = "cls"
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    def _trunk(self, x, deterministic):
        b, n, _ = x.shape
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, n + 1, self.dim)
        )
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, robust=self.robust, out_bias=True,
            dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return _head(x, self.num_classes, self.dtype)


class ViT1D(_ClsTokenViTBase):
    """(ref vit_1d.py:77-133.) Input [B, L, C]."""

    seq_len: int = 256
    patch_size: int = 16
    channels: int = 3

    @nn.compact
    def __call__(self, series, *, deterministic: bool = True):
        b, l, c = series.shape
        p = self.patch_size
        x = series.reshape(b, l // p, p * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        return self._trunk(x, deterministic)


class ViT3D(_ClsTokenViTBase):
    """(ref vit_3d.py:82-129.) Input [B, F, H, W, C]."""

    image_size: Any = 32
    image_patch_size: Any = 8
    frames: int = 8
    frame_patch_size: int = 2
    channels: int = 3

    @nn.compact
    def __call__(self, video, *, deterministic: bool = True):
        b, f, h, w, c = video.shape
        ph, pw = pair(self.image_patch_size)
        pf = self.frame_patch_size
        x = video.reshape(b, f // pf, pf, h // ph, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 5, 4, 6, 2, 7).reshape(
            b, (f // pf) * (h // ph) * (w // pw), ph * pw * pf * c
        )
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        return self._trunk(x, deterministic)


class ViViT(nn.Module):
    """Video ViT with factorized spatial/temporal transformers
    (ref vivit.py:85-183)."""

    image_size: Any
    image_patch_size: Any
    frames: int
    frame_patch_size: int
    num_classes: int
    dim: int
    spatial_depth: int
    temporal_depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video, *, deterministic: bool = True):
        b, fr, h, w, c = video.shape
        ph, pw = pair(self.image_patch_size)
        pf = self.frame_patch_size
        f = fr // pf
        n = (h // ph) * (w // pw)
        x = video.reshape(b, f, pf, h // ph, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 5, 4, 6, 2, 7).reshape(b, f, n, ph * pw * pf * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, f, n, self.dim)
        )
        x = x + pos.astype(x.dtype)
        gap = self.pool == "mean"

        if not gap:
            s_cls = self.param(
                "spatial_cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
            )
            sc = jnp.broadcast_to(s_cls.astype(x.dtype), (b, f, 1, self.dim))
            x = jnp.concatenate([sc, x], axis=2)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        x = x.reshape(b * f, x.shape[2], self.dim)
        x = Transformer(
            self.dim, self.spatial_depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, robust=self.robust, out_bias=True,
            dtype=self.dtype, name="spatial_transformer",
        )(x, deterministic=deterministic)
        x = x.reshape(b, f, -1, self.dim)
        x = x[:, :, 0] if not gap else jnp.mean(x, axis=2)

        if not gap:
            t_cls = self.param(
                "temporal_cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
            )
            tc = jnp.broadcast_to(t_cls.astype(x.dtype), (b, 1, self.dim))
            x = jnp.concatenate([tc, x], axis=1)
        x = Transformer(
            self.dim, self.temporal_depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, robust=self.robust, out_bias=True,
            dtype=self.dtype, name="temporal_transformer",
        )(x, deterministic=deterministic)
        x = x[:, 0] if not gap else jnp.mean(x, axis=1)
        return _head(x, self.num_classes, self.dtype)


class ViTWithPatchDropout(nn.Module):
    """(ref vit_with_patch_dropout.py:101-152.) Per-sample random token
    subsampling during training; note this variant adds posemb BEFORE the CLS
    token and keeps a per-patch posemb table (ref :118, :140-147)."""

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
    patch_dropout: float = 0.25
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
        pos = self.param("pos_embedding", nn.initializers.normal(1.0), (n, self.dim))
        x = x + pos.astype(x.dtype)[None]

        if not deterministic and self.patch_dropout > 0:
            keep = 1.0 - self.patch_dropout
            idx = patch_dropout_indices(self.make_rng("dropout"), b, n, keep)
            x = jnp.take_along_axis(x, idx[..., None], axis=1)

        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            dropout=self.dropout, robust=self.robust, out_bias=True, dtype=self.dtype,
            name="transformer",
        )(x, deterministic=deterministic)
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return _head(x, self.num_classes, self.dtype)


class SimpleViTWithPatchDropout(nn.Module):
    """(ref simple_vit_with_patch_dropout.py:102-148.)"""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    patch_dropout: float = 0.5
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        from ..ops import posemb_sincos_2d

        b, h, w, c = img.shape
        ph, pw = pair(self.patch_size)
        gh, gw = h // ph, w // pw
        x = img.reshape(b, gh, ph, gw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, ph * pw * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        x = x + posemb_sincos_2d(gh, gw, self.dim, dtype=x.dtype)[None]

        if not deterministic and self.patch_dropout > 0:
            keep = 1.0 - self.patch_dropout
            idx = patch_dropout_indices(self.make_rng("dropout"), b, gh * gw, keep)
            x = jnp.take_along_axis(x, idx[..., None], axis=1)

        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            robust=self.robust, dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        return _head(jnp.mean(x, axis=1), self.num_classes, self.dtype)


class PatchMerger(nn.Module):
    """Learned token reduction: softmax(Q·LN(x)ᵀ)·x with learned queries
    (ref vit_with_patch_merger.py:21-33)."""

    dim: int
    num_tokens_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = self.param(
            "queries", nn.initializers.normal(1.0), (self.num_tokens_out, self.dim)
        )
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        sim = jnp.einsum("md,bnd->bmn", q.astype(xn.dtype), xn) * (self.dim**-0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        return jnp.einsum("bmn,bnd->bmd", attn, x)


class ViTWithPatchMerger(nn.Module):
    """(ref vit_with_patch_merger.py:111-147.) PatchMerger inserted mid-stack
    (layer index ``depth // 2`` by default), mean-pool head."""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    patch_merge_layer: Optional[int] = None
    patch_merge_num_tokens: int = 8
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
        x = x + pos[:, :n].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        merge_at = (
            self.patch_merge_layer
            if self.patch_merge_layer is not None
            else self.depth // 2
        )
        for i in range(self.depth):
            if i == merge_at:
                x = PatchMerger(
                    self.dim, self.patch_merge_num_tokens, dtype=self.dtype,
                    name="patch_merger",
                )(x)
            x = Attention(
                self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.dropout, robust=self.robust, out_bias=True, dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(x, deterministic=deterministic) + x
            x = FeedForward(
                self.dim, self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                name=f"layers_{i}_ff",
            )(x, deterministic=deterministic) + x
        return _head(jnp.mean(x, axis=1), self.num_classes, self.dtype)


class ParallelViT(nn.Module):
    """Parallel attention+FF branches per block (ref parallel_vit.py:95-140)."""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    num_parallel_branches: int = 2
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
            attn_sum = sum(
                Attention(
                    self.dim, heads=self.heads, dim_head=self.dim_head,
                    dropout=self.dropout, robust=self.robust, out_bias=True, dtype=self.dtype,
                    name=f"layers_{i}_attn_{j}",
                )(x, deterministic=deterministic)
                for j in range(self.num_parallel_branches)
            )
            x = x + attn_sum
            ff_sum = sum(
                FeedForward(
                    self.dim, self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                    name=f"layers_{i}_ff_{j}",
                )(x, deterministic=deterministic)
                for j in range(self.num_parallel_branches)
            )
            x = x + ff_sum

        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return _head(x, self.num_classes, self.dtype)


class SmallDatasetViT(nn.Module):
    """SPT shifted-patch tokenization + LSA (learned temperature, diagonal
    mask) for small datasets (ref vit_for_small_dataset.py:37-145)."""

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

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        b, h, w, c = img.shape
        ph, pw = pair(self.patch_size)
        # SPT: concat image with 4 one-pixel diagonal shifts (ref :86-100)
        def shift(x, dy, dx):
            pad = ((0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0))
            xp = jnp.pad(x, pad)
            return xp[:, max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]

        shifted = [img] + [
            shift(img, dy, dx) for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0))
        ]
        x = jnp.concatenate(shifted, axis=-1)  # [B, H, W, 5C]
        x = x.reshape(b, h // ph, ph, w // pw, pw, 5 * c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ph * pw * 5 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="spt_norm")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="spt_proj")(x)

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

        inner = self.heads * self.dim_head
        import math

        for i in range(self.depth):
            # LSA (ref :37-69): learned log-temperature + diagonal mask
            xa = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_attn_{i}")(x)
            temp = self.param(
                f"temperature_{i}",
                nn.initializers.constant(math.log(self.dim_head**-0.5)),
                (),
            )
            qkv = nn.Dense(
                inner * 3, use_bias=False, dtype=self.dtype, name=f"to_qkv_{i}"
            )(xa)
            q, k, v = (
                t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)
                for t in jnp.split(qkv, 3, axis=-1)
            )
            dots = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * jnp.exp(temp)
            eye = jnp.eye(dots.shape[-1], dtype=bool)
            dots = jnp.where(eye, jnp.finfo(jnp.float32).min, dots)
            attn = robust_softmax(dots, robust=self.robust)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
            out = nn.Dense(self.dim, dtype=self.dtype, name=f"to_out_{i}")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
            x = x + out
            xf = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_ff_{i}")(x)
            f1 = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"ff_{i}_fc1")(xf)
            f1 = gelu(f1)
            f1 = nn.Dropout(self.dropout)(f1, deterministic=deterministic)
            f2 = nn.Dense(self.dim, dtype=self.dtype, name=f"ff_{i}_fc2")(f1)
            f2 = nn.Dropout(self.dropout)(f2, deterministic=deterministic)
            x = x + f2

        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return _head(x, self.num_classes, self.dtype)


class EfficientViT(nn.Module):
    """ViT shell over an arbitrary external transformer module
    (ref efficient.py:9-47)."""

    image_size: Any
    patch_size: int
    num_classes: int
    dim: int
    transformer: nn.Module
    pool: str = "cls"
    channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        b, h, w, c = img.shape
        p = self.patch_size
        x = img.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p * p * c)
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
        x = self.transformer(x, deterministic=deterministic)
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return _head(x, self.num_classes, self.dtype)


class _MemAttention(nn.Module):
    """Attention with optional per-layer memory keys/values and attention
    mask (ref learnable_memory_vit.py:44-88)."""

    dim: int
    heads: int
    dim_head: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, attn_mask=None, memories=None, deterministic=True):
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x_kv = x
        if memories is not None:
            mem = memories
            if mem.ndim == 2:
                mem = jnp.broadcast_to(mem[None], (x.shape[0],) + mem.shape)
            x_kv = jnp.concatenate([x_kv, mem.astype(x.dtype)], axis=1)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(x_kv)
        k, v = jnp.split(kv, 2, axis=-1)
        b, n, m = x.shape[0], x.shape[1], x_kv.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        dots = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_head**-0.5)
        if attn_mask is not None:
            dots = jnp.where(attn_mask, dots, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(dots, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class LearnableMemoryViT(nn.Module):
    """The frozen-backbone host ViT of the learnable-memory adapter
    (ref learnable_memory_vit.py:107-152); its transformer accepts optional
    memories + attention masks."""

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
    dtype: Any = jnp.float32

    def setup(self):
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        self.num_patches = (ih // ph) * (iw // pw)
        self.patch_proj = nn.Dense(self.dim, dtype=self.dtype)
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, self.num_patches + 1, self.dim),
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.attns = [
            _MemAttention(
                self.dim, self.heads, self.dim_head, self.dropout,
                dtype=self.dtype, name=f"layers_{i}_attn",
            )
            for i in range(self.depth)
        ]
        self.ffs = [
            FeedForward(
                self.dim, self.mlp_dim, dropout=self.dropout, dtype=self.dtype,
                name=f"layers_{i}_ff",
            )
            for i in range(self.depth)
        ]
        self.head_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.head = nn.Dense(self.num_classes, dtype=self.dtype)

    def img_to_tokens(self, img, deterministic=True):
        b, h, w, c = img.shape
        ph, pw = pair(self.patch_size)
        x = img.reshape(b, h // ph, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ph * pw * c)
        x = self.patch_proj(x)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding.astype(x.dtype)
        return self.emb_drop(x, deterministic=deterministic)

    def run_transformer(self, x, *, attn_mask=None, memories=None,
                        deterministic=True):
        for i, (attn, ff) in enumerate(zip(self.attns, self.ffs)):
            mem = memories[i] if memories is not None else None
            x = attn(
                x, attn_mask=attn_mask, memories=mem, deterministic=deterministic
            ) + x
            x = ff(x, deterministic=deterministic) + x
        return x

    def __call__(self, img, *, deterministic: bool = True):
        x = self.img_to_tokens(img, deterministic)
        x = self.run_transformer(x, deterministic=deterministic)
        x = self.head_norm(x[:, 0])
        return self.head(x)


class Adapter(nn.Module):
    """Learnable-memory adaptation of a FROZEN LearnableMemoryViT
    (ref learnable_memory_vit.py:155-216): per-layer memory tokens + a memory
    CLS token + a task head; the attention mask preserves the original ViT's
    computation (main tokens cannot see the memories)."""

    vit: LearnableMemoryViT
    num_memories_per_layer: int = 10
    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        import numpy as np

        b = img.shape[0]
        dim = self.vit.dim
        n_tok = self.vit.num_patches + 1  # patches + original CLS
        mem = self.num_memories_per_layer

        tokens = jax.lax.stop_gradient(
            self.vit.img_to_tokens(img, deterministic=deterministic)
        )
        mem_cls = self.param("memory_cls_token", nn.initializers.normal(1.0), (dim,))
        memories = self.param(
            "memories_per_layer", nn.initializers.normal(1.0),
            (self.vit.depth, mem, dim),
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(mem_cls.astype(tokens.dtype), (b, 1, dim)), tokens],
            axis=1,
        )
        # mask (ref :190-194): [1+n_tok, 1+n_tok+mem]
        mask = np.ones((n_tok, n_tok), bool)
        mask = np.pad(mask, ((0, 0), (1, mem)), constant_values=False)
        mask = np.pad(mask, ((1, 0), (0, 0)), constant_values=True)
        out = self.vit.run_transformer(
            tokens,
            attn_mask=jnp.asarray(mask),
            memories=memories,
            deterministic=deterministic,
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="adapter_norm")(out[:, 0])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="adapter_head")(x)
