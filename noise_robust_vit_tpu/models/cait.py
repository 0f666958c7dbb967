"""CaiT — Class-Attention in Image Transformers (ref cait.py).

Talking-heads attention (learned head-mixing pre & post softmax,
ref cait.py:110-119), depth-dependent LayerScale (ref cait.py:36-50),
stochastic whole-layer dropout (ref cait.py:17-33), a patch-transformer stage
followed by a class-attention stage where the CLS token cross-attends to
``cat(cls, patches)`` (ref cait.py:178-235).

``robust`` swaps the softmax for ``SinkhornAttention(-1)`` (ref cait.py:89-92
— note the Sinkhorn runs BETWEEN the pre- and post-softmax head mixings).
The reference's ``CaiT.__init__`` omits the ``robust`` kwarg its own
Transformer supports (latent bug); the intent is threaded here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import gelu, robust_softmax, talking_heads_robust_softmax
from ..utils import pair

__all__ = ["CaiT"]


class _TalkingHeadsAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, context=None, deterministic: bool = True):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        ctx = x if context is None else jnp.concatenate([x, context], axis=1)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        b, n, m = x.shape[0], x.shape[1], ctx.shape[1]
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, dh).transpose(0, 2, 1, 3)

        mix_pre = self.param("mix_heads_pre_attn", nn.initializers.normal(1.0), (h, h))
        mix_post = self.param("mix_heads_post_attn", nn.initializers.normal(1.0), (h, h))

        dots = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        if self.dropout == 0.0 or deterministic:
            # fused sandwich (pre-mix → sinkhorn → post-mix in one kernel
            # residency on the robust square path; identical unfused math
            # otherwise) — only valid with no dropout BETWEEN the
            # normalization and the post-mix
            attn = talking_heads_robust_softmax(
                dots, mix_pre, mix_post, robust=self.robust
            )
        else:
            dots = jnp.einsum(
                "bhij,hg->bgij", dots, mix_pre.astype(dots.dtype)
            )
            attn = robust_softmax(dots, robust=self.robust)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            attn = jnp.einsum(
                "bhij,hg->bgij", attn, mix_post.astype(attn.dtype)
            )
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


def _layerscale_init(depth_ind: int) -> float:
    """(ref cait.py:38-44, per CaiT paper §2.)"""
    if depth_ind <= 18:
        return 0.1
    if depth_ind <= 24:
        return 1e-5
    return 1e-6


class _Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float
    layer_dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, context=None, deterministic: bool = True):
        for i in range(self.depth):
            scale_a = self.param(
                f"scale_attn_{i}",
                nn.initializers.constant(_layerscale_init(i + 1)),
                (1, 1, self.dim),
            )
            scale_f = self.param(
                f"scale_ff_{i}",
                nn.initializers.constant(_layerscale_init(i + 1)),
                (1, 1, self.dim),
            )
            # stochastic whole-layer dropout (ref cait.py:17-33): the branch
            # output is gated per forward pass
            if self.layer_dropout > 0.0 and not deterministic:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.layer_dropout, ()
                ).astype(x.dtype)
            else:
                keep = 1.0
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_attn_{i}")(x)
            h = _TalkingHeadsAttention(
                self.dim, self.heads, self.dim_head, self.dropout, self.robust,
                dtype=self.dtype, name=f"attn_{i}",
            )(h, context=context, deterministic=deterministic)
            x = x + keep * h * scale_a.astype(x.dtype)
            f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_ff_{i}")(x)
            f = _FeedForward(
                self.dim, self.mlp_dim, self.dropout, dtype=self.dtype,
                name=f"ff_{i}",
            )(f, deterministic=deterministic)
            x = x + keep * f * scale_f.astype(x.dtype)
        return x


class CaiT(nn.Module):
    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    cls_depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    layer_dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True, return_features: bool = False):
        ih, iw = pair(self.image_size)
        ph, pw = pair(self.patch_size)
        if ih % ph or iw % pw:
            raise ValueError("Image dimensions must be divisible by the patch size.")
        b, h, w, c = img.shape
        x = img.reshape(b, h // ph, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ph * pw * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        n = x.shape[1]

        pos = self.param("pos_embedding", nn.initializers.normal(1.0), (1, n, self.dim))
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        x = _Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, self.layer_dropout, self.robust, dtype=self.dtype,
            name="patch_transformer",
        )(x, deterministic=deterministic)

        cls_tokens = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim))
        x = _Transformer(
            self.dim, self.cls_depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, self.layer_dropout, self.robust, dtype=self.dtype,
            name="cls_transformer",
        )(cls_tokens, context=x, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x[:, 0])
        if return_features:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
