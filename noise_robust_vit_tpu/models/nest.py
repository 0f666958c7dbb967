"""NesT — Nested hierarchical transformer (ref nest.py).

Non-overlapping patch embedding → per-hierarchy: split the map into 2^level ×
2^level blocks, run a transformer (conv-qkv attention + 1×1-conv FFN + a
learned flat positional embedding added per block, ref nest.py:49-110) within
each block, then aggregate (3×3 conv + channel-LN + maxpool downsample,
ref nest.py:82-87)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import to_ntuple
from .cvt import _ChannelLN

__all__ = ["NesT"]


class _NestTransformer(nn.Module):
    dim: int
    seq_len: int
    depth: int
    heads: int
    mlp_mult: int
    dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        bb, h, w, c = x.shape
        pos = self.param("pos_emb", nn.initializers.normal(1.0), (self.seq_len,))
        x = x + pos[: h * w].reshape(1, h, w, 1).astype(x.dtype)
        dh = self.dim // self.heads
        for i in range(self.depth):
            xn = _ChannelLN(self.dim, dtype=self.dtype, name=f"b{i}_norm1")(x)
            qkv = nn.Conv(
                self.dim * 3, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"b{i}_to_qkv",
            )(xn)
            q, k, v = (
                t.reshape(bb, h * w, self.heads, dh).transpose(0, 2, 1, 3)
                for t in jnp.split(qkv, 3, axis=-1)
            )
            dots = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * (dh**-0.5)
            attn = robust_softmax(dots, robust=self.robust)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(bb, h, w, self.dim)
            out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name=f"b{i}_to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
            x = x + out
            xn = _ChannelLN(self.dim, dtype=self.dtype, name=f"b{i}_norm2")(x)
            f = nn.Conv(self.dim * self.mlp_mult, (1, 1), dtype=self.dtype,
                        name=f"b{i}_ff1")(xn)
            f = gelu(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            f = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name=f"b{i}_ff2")(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            x = x + f
        return x


class NesT(nn.Module):
    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    heads: int
    num_hierarchies: int
    block_repeats: Any
    mlp_mult: int = 4
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        b, ih, iw, c = img.shape
        p = self.patch_size
        fmap = ih // p
        blocks = 2 ** (self.num_hierarchies - 1)
        seq_len = (fmap // blocks) ** 2
        hierarchies = list(reversed(range(self.num_hierarchies)))
        mults = [2**i for i in reversed(hierarchies)]
        layer_heads = [m * self.heads for m in mults]
        layer_dims = [m * self.dim for m in mults]
        last_dim = layer_dims[-1]
        layer_dims = layer_dims + [layer_dims[-1]]
        block_repeats = to_ntuple(self.num_hierarchies)(self.block_repeats)

        # patchify: (p1 p2 c)-ordered features, 1×1 conv embed (ref :145-148)
        x = img.reshape(b, fmap, p, fmap, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, fmap, fmap, p * p * c)
        x = nn.Conv(layer_dims[0], (1, 1), dtype=self.dtype, name="patch_embed")(x)

        for idx, (level, heads, depth) in enumerate(
            zip(hierarchies, layer_heads, block_repeats)
        ):
            dim_in, dim_out = layer_dims[idx], layer_dims[idx + 1]
            bs = 2**level
            bb, h, w, _ = x.shape
            # split into bs×bs blocks (ref :176-178)
            x = x.reshape(bb, bs, h // bs, bs, w // bs, dim_in)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h // bs, w // bs, dim_in)
            x = _NestTransformer(
                dim_in, seq_len, depth, heads, self.mlp_mult, self.dropout,
                self.robust, dtype=self.dtype, name=f"level{idx}_transformer",
            )(x, deterministic=deterministic)
            x = x.reshape(bb, bs, bs, h // bs, w // bs, dim_in)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bb, h, w, dim_in)
            if level != 0:
                # Aggregate (ref :82-87)
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=self.dtype,
                            name=f"level{idx}_aggregate")(x)
                x = _ChannelLN(dim_out, dtype=self.dtype, name=f"level{idx}_ln")(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x = _ChannelLN(last_dim, dtype=self.dtype, name="head_norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
