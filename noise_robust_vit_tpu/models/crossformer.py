"""CrossFormer — cross-scale embedding + long/short distance attention with
dynamic position bias (ref crossformer.py).

Stages: CrossEmbedLayer (parallel convs at several kernel sizes, channels
split across scales, ref crossformer.py:14-36) then transformer layers that
alternate SHORT (window-partition) and LONG (dilated-partition) attention,
each with a DynamicPositionBias MLP over relative coordinates
(ref :41-53, :78-176)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import to_ntuple
from .cvt import _ChannelLN

__all__ = ["CrossFormer"]


class _DPB(nn.Module):
    """(ref crossformer.py:41-53.)"""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rel):
        x = rel
        for i in range(3):
            x = nn.Dense(self.dim, dtype=jnp.float32, name=f"fc{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(1, dtype=jnp.float32, name="out")(x)[..., 0]


class _CrossAttention(nn.Module):
    """(ref crossformer.py:78-176.)"""

    dim: int
    attn_type: str
    window_size: int
    dim_head: int = 32
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        wsz = self.window_size
        heads = self.dim // self.dim_head
        inner = heads * self.dim_head
        b, hh, ww, _ = x.shape
        x = _ChannelLN(self.dim, dtype=self.dtype, name="norm")(x)

        if self.attn_type == "short":
            xw = x.reshape(b, hh // wsz, wsz, ww // wsz, wsz, self.dim)
            xw = xw.transpose(0, 1, 3, 2, 4, 5)
        else:  # long: dilated partition 'b d (l1 h) (l2 w)'
            xw = x.reshape(b, wsz, hh // wsz, wsz, ww // wsz, self.dim)
            xw = xw.transpose(0, 2, 4, 1, 3, 5)
        xw = xw.reshape(-1, wsz * wsz, self.dim)

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(xw)
        q, k, v = (
            t.reshape(-1, wsz * wsz, heads, self.dim_head).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        sim = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_head**-0.5)

        # dynamic position bias over all (2w+1)² relative offsets
        pos = np.arange(-wsz, wsz + 1)
        rel = np.stack(np.meshgrid(pos, pos, indexing="ij")).reshape(2, -1).T
        biases = _DPB(self.dim // 4, name="dpb")(jnp.asarray(rel, jnp.float32))
        grid = np.stack(
            np.meshgrid(np.arange(wsz), np.arange(wsz), indexing="ij")
        ).reshape(2, -1).T
        rp = grid[:, None] - grid[None, :] + wsz - 1
        idx = rp[..., 0] * (2 * wsz - 1) + rp[..., 1]
        sim = sim + biases[jnp.asarray(idx)][None, None].astype(sim.dtype)

        attn = robust_softmax(sim, robust=self.robust)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, wsz * wsz, inner)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(
            out.reshape(-1, wsz, wsz, inner)
        )
        if self.attn_type == "short":
            out = out.reshape(b, hh // wsz, ww // wsz, wsz, wsz, self.dim)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, self.dim)
        else:
            out = out.reshape(b, hh // wsz, ww // wsz, wsz, wsz, self.dim)
            out = out.transpose(0, 3, 1, 4, 2, 5).reshape(b, hh, ww, self.dim)
        return out


class _ConvFF(nn.Module):
    dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = _ChannelLN(self.dim, dtype=self.dtype, name="norm")(x)
        y = nn.Conv(self.dim * 4, (1, 1), dtype=self.dtype, name="fc1")(y)
        y = gelu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(y)
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)


class CrossFormer(nn.Module):
    """(ref crossformer.py:208-269.)"""

    dim: Sequence[int] = (64, 128, 256, 512)
    depth: Sequence[int] = (2, 2, 8, 2)
    global_window_size: Any = (8, 4, 2, 1)
    local_window_size: Any = 7
    cross_embed_kernel_sizes: Sequence = ((4, 8, 16, 32), (2, 4), (2, 4), (2, 4))
    cross_embed_strides: Sequence[int] = (4, 2, 2, 2)
    num_classes: int = 1000
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    channels: int = 3
    dim_head: int = 32
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        four = to_ntuple(4)
        dims = four(self.dim)
        depths = four(self.depth)
        gwin = four(self.global_window_size)
        lwin = four(self.local_window_size)
        kernels = self.cross_embed_kernel_sizes
        strides = four(self.cross_embed_strides)

        for s in range(4):
            # CrossEmbedLayer (ref :14-36)
            ks = sorted(kernels[s])
            dim_out = dims[s]
            dim_scales = [int(dim_out / (2**i)) for i in range(1, len(ks))]
            dim_scales = dim_scales + [dim_out - sum(dim_scales)]
            stride = strides[s]
            fmaps = [
                nn.Conv(
                    dsc, (kk, kk), strides=(stride, stride),
                    padding=(kk - stride) // 2, dtype=self.dtype,
                    name=f"s{s}_cel{j}",
                )(x)
                for j, (kk, dsc) in enumerate(zip(ks, dim_scales))
            ]
            x = jnp.concatenate(fmaps, axis=-1)
            for d in range(depths[s]):
                x = x + _CrossAttention(
                    dim_out, "short", lwin[s], dim_head=self.dim_head,
                    dropout=self.attn_dropout, robust=self.robust,
                    dtype=self.dtype, name=f"s{s}_b{d}_short",
                )(x, deterministic=deterministic)
                x = x + _ConvFF(dim_out, self.ff_dropout, dtype=self.dtype,
                                name=f"s{s}_b{d}_ff1")(x, deterministic=deterministic)
                x = x + _CrossAttention(
                    dim_out, "long", gwin[s], dim_head=self.dim_head,
                    dropout=self.attn_dropout, robust=self.robust,
                    dtype=self.dtype, name=f"s{s}_b{d}_long",
                )(x, deterministic=deterministic)
                x = x + _ConvFF(dim_out, self.ff_dropout, dtype=self.dtype,
                                name=f"s{s}_b{d}_ff2")(x, deterministic=deterministic)

        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
