"""RegionViT — regional-to-local attention (ref regionvit.py).

Two token streams: local tokens (strided conv encoder) and region tokens
(one per window, space-to-depth + 1×1 conv). Per R2L layer: self-attention
among region tokens, then each window's local tokens attend together WITH
their region token prepended (shared attention weights module, local
relative-position bias), then FFN; streams are re-split afterwards
(ref regionvit.py:102-178). Classification head pools the REGION tokens
(ref :250-268)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import to_ntuple

__all__ = ["RegionViT"]


class _Attention(nn.Module):
    """(ref regionvit.py:50-100.)"""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, rel_pos_bias=None, deterministic: bool = True):
        h = self.heads
        inner = h * self.dim_head
        b, n, _ = x.shape
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(xn)
        q, k, v = (
            t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        sim = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_head**-0.5)
        if rel_pos_bias is not None:
            sim = sim + rel_pos_bias.astype(sim.dtype)
        attn = robust_softmax(sim, robust=self.robust)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _FF(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim * self.mult, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class _R2LTransformer(nn.Module):
    """(ref regionvit.py:102-178.)"""

    dim: int
    window_size: int
    depth: int = 4
    heads: int = 4
    dim_head: int = 32
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, local_tokens, region_tokens, *, deterministic: bool = True):
        b, lh, lw, c = local_tokens.shape
        rh, rw = region_tokens.shape[1:3]
        wh, ww = lh // rh, lw // rw

        # local relative position bias (+1 row/col of zeros for the region
        # token slot, ref :137-149)
        rel_positions = 2 * self.window_size - 1
        table = self.param(
            "local_rel_pos_bias", nn.initializers.normal(1.0),
            (rel_positions**2, self.heads),
        )
        gy, gx = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
        grid = np.stack([gy.reshape(-1), gx.reshape(-1)])
        rel = grid[:, :, None] - grid[:, None, :] + self.window_size - 1
        idx = rel[0] * 1 + rel[1] * (2 * self.window_size - 1)
        bias = table[jnp.asarray(idx)]  # [n, n, heads]
        bias = bias.transpose(2, 0, 1)[None]  # [1, h, n, n]
        bias = jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))

        lt = local_tokens.reshape(b, lh * lw, c)
        rt = region_tokens.reshape(b, rh * rw, c)
        for i in range(self.depth):
            attn = _Attention(
                self.dim, self.heads, self.dim_head, self.attn_dropout,
                self.robust, dtype=self.dtype, name=f"l{i}_attn",
            )
            ff = _FF(self.dim, dropout=self.ff_dropout, dtype=self.dtype,
                     name=f"l{i}_ff")
            rt = attn(rt, deterministic=deterministic) + rt
            # window the local tokens, prepend each window's region token
            ltw = lt.reshape(b, rh, wh, rw, ww, c)
            ltw = ltw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, c)
            rtw = rt.reshape(-1, 1, c)
            both = jnp.concatenate([rtw, ltw], axis=1)
            both = attn(both, rel_pos_bias=bias, deterministic=deterministic) + both
            both = ff(both, deterministic=deterministic) + both
            rtw, ltw = both[:, :1], both[:, 1:]
            ltw = ltw.reshape(b, rh, rw, wh, ww, c)
            lt = ltw.transpose(0, 1, 3, 2, 4, 5).reshape(b, lh * lw, c)
            rt = rtw.reshape(b, rh * rw, c)

        return (
            lt.reshape(b, lh, lw, c),
            rt.reshape(b, rh, rw, c),
        )


class RegionViT(nn.Module):
    """(ref regionvit.py:182-268.)"""

    dim: Sequence[int] = (64, 128, 256, 512)
    depth: Sequence[int] = (2, 2, 8, 2)
    window_size: int = 7
    num_classes: int = 1000
    tokenize_local_3_conv: bool = False
    local_patch_size: int = 4
    use_peg: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    channels: int = 3
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        dims = to_ntuple(4)(self.dim)
        depths = to_ntuple(4)(self.depth)
        init_dim, last_dim = dims[0], dims[-1]
        rps = self.local_patch_size * self.window_size
        b, h, w, c = img.shape

        if self.tokenize_local_3_conv:
            x = nn.Conv(init_dim, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name="local_enc0")(img)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="local_ln0")(x)
            x = gelu(x)
            x = nn.Conv(init_dim, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name="local_enc1")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="local_ln1")(x)
            x = gelu(x)
            local_tokens = nn.Conv(init_dim, (3, 3), padding=1,
                                   dtype=self.dtype, name="local_enc2")(x)
        else:
            local_tokens = nn.Conv(
                init_dim, (8, 8), strides=(4, 4), padding=3, dtype=self.dtype,
                name="local_encoder",
            )(img)

        # region encoder: space-to-depth (c p1 p2) + 1×1 conv (ref :225-228)
        r = img.reshape(b, h // rps, rps, w // rps, rps, c)
        r = r.transpose(0, 1, 3, 5, 2, 4).reshape(
            b, h // rps, w // rps, c * rps * rps
        )
        region_tokens = nn.Conv(init_dim, (1, 1), dtype=self.dtype,
                                name="region_encoder")(r)

        current = init_dim
        for ind in range(4):
            dim = dims[ind]
            if ind != 0:
                local_tokens = nn.Conv(
                    dim, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name=f"s{ind}_down_local",
                )(local_tokens)
                region_tokens = nn.Conv(
                    dim, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name=f"s{ind}_down_region",
                )(region_tokens)
                if self.use_peg:
                    local_tokens = local_tokens + nn.Conv(
                        dim, (3, 3), padding=1, feature_group_count=dim,
                        dtype=self.dtype, name=f"s{ind}_peg",
                    )(local_tokens)
            local_tokens, region_tokens = _R2LTransformer(
                dim, window_size=self.window_size, depth=depths[ind],
                attn_dropout=self.attn_dropout, ff_dropout=self.ff_dropout,
                robust=self.robust, dtype=self.dtype, name=f"s{ind}_r2l",
            )(local_tokens, region_tokens, deterministic=deterministic)
            current = dim

        x = jnp.mean(region_tokens, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
