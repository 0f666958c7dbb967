"""DeepViT — re-attention (ref deepvit.py).

Standard ViT layout with a learned head-mixing matrix applied to the
post-softmax attention followed by a LayerNorm over the head axis
(ref deepvit.py:36-82), which combats attention collapse in deep stacks.
Constructor matches ref deepvit.py:98. ``robust`` is added in the fork's
spirit (Sinkhorn before the re-attention mixing), default off.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import pair

__all__ = ["DeepViT"]


class _ReAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        b, n, _ = x.shape
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = (
            t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        dots = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        attn = robust_softmax(dots, robust=self.robust)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        # re-attention (ref deepvit.py:63-71): mix heads, LN over head axis
        mix = self.param("reattn_weights", nn.initializers.normal(1.0), (h, h))
        attn = jnp.einsum("bhij,hg->bgij", attn, mix.astype(attn.dtype))
        attn = attn.transpose(0, 2, 3, 1)  # b i j h
        attn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="reattn_norm")(attn)
        attn = attn.transpose(0, 3, 1, 2)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class DeepViT(nn.Module):
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
    def __call__(self, img, *, deterministic: bool = True, return_features: bool = False):
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        if ih % ph or iw % pw:
            raise ValueError("Image dimensions must be divisible by the patch size.")
        if self.pool not in ("cls", "mean"):
            raise ValueError("pool type must be either cls or mean")
        b, h, w, c = img.shape
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
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        for i in range(self.depth):
            hpre = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_attn_{i}")(x)
            x = x + _ReAttention(
                self.dim, self.heads, self.dim_head, self.dropout, self.robust,
                dtype=self.dtype, name=f"attn_{i}",
            )(hpre, deterministic=deterministic)
            fpre = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_ff_{i}")(x)
            f = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"ff_{i}_fc1")(fpre)
            f = gelu(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            f = nn.Dense(self.dim, dtype=self.dtype, name=f"ff_{i}_fc2")(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            x = x + f

        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        if return_features:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
