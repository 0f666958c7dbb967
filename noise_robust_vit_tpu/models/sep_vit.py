"""SepViT — depthwise-separable attention with window tokens (ref sep_vit.py).

Each DSSA: windowed ("depthwise") attention over each window WITH a learned
window token prepended, then a second ("pointwise") attention among the
window tokens whose weights mix the windowed feature maps across windows
(ref sep_vit.py:73-210). Stages: overlapping conv patch embed + PEG +
transformer (ref :241-296)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import to_ntuple
from .cvt import _ChannelLN

__all__ = ["SepViT"]


class _DSSA(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 32
    window_size: int = 7
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, hh, ww, _ = x.shape
        wsz, heads, dh = self.window_size, self.heads, self.dim_head
        inner = heads * dh
        nx, ny = hh // wsz, ww // wsz
        num_windows = nx * ny

        # windows: [(b x y), wsz*wsz, dim]
        xw = x.reshape(b, nx, wsz, ny, wsz, self.dim)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wsz * wsz, self.dim)
        # prepend learned window token (ref :97, :146-149)
        wt = self.param("window_tokens", nn.initializers.normal(1.0), (self.dim,))
        wtb = jnp.broadcast_to(wt.astype(xw.dtype), (xw.shape[0], 1, self.dim))
        xw = jnp.concatenate([wtb, xw], axis=1)

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(xw)
        n = xw.shape[1]
        q, k, v = (
            t.reshape(-1, n, heads, dh).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        dots = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        attn = robust_softmax(dots, robust=self.robust)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)

        window_tokens, fmaps = out[:, :, 0], out[:, :, 1:]  # [(bxy), h, d], [(bxy), h, n, d]

        if num_windows == 1:
            fmap = fmaps.reshape(b, nx, ny, heads, wsz, wsz, dh)
            fmap = fmap.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hh, ww, inner)
            fmap = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(fmap)
            return nn.Dropout(self.dropout)(fmap, deterministic=deterministic)

        wtok = window_tokens.reshape(b, nx * ny, heads, dh).transpose(0, 2, 1, 3)
        fmaps = fmaps.reshape(b, nx * ny, heads, wsz * wsz, dh).transpose(0, 2, 1, 3, 4)

        # prenorm + GELU then a head-mixing projection to window q/k
        # (ref :102-108: LN over dh, GELU, Conv1d over the h·dh axis)
        wt_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="wt_norm")(wtok)
        wt_in = gelu(wt_in)
        flat = wt_in.transpose(0, 2, 1, 3).reshape(b, num_windows, heads * dh)
        wqk = nn.Dense(2 * heads * dh, dtype=self.dtype, name="wt_to_qk")(flat)
        wqk = wqk.reshape(b, num_windows, heads, 2 * dh).transpose(0, 2, 1, 3)
        w_q, w_k = jnp.split(wqk, 2, axis=-1)
        w_dots = jnp.einsum(
            "bhid,bhjd->bhij", w_q, w_k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        w_attn = robust_softmax(w_dots, robust=self.robust)
        w_attn = nn.Dropout(self.dropout)(w_attn, deterministic=deterministic)
        agg = jnp.einsum("bhij,bhjwd->bhiwd", w_attn.astype(fmaps.dtype), fmaps)

        fmap = agg.transpose(0, 2, 3, 1, 4).reshape(b, nx, ny, wsz, wsz, inner)
        fmap = fmap.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, inner)
        fmap = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(fmap)
        return nn.Dropout(self.dropout)(fmap, deterministic=deterministic)


class SepViT(nn.Module):
    """(ref sep_vit.py:241-294.)"""

    num_classes: int
    dim: int
    depth: Sequence[int]
    heads: Any
    window_size: Any = 7
    dim_head: int = 32
    ff_mult: int = 4
    channels: int = 3
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if not isinstance(self.depth, (tuple, list)):
            raise ValueError("depth needs to be a tuple")
        num_stages = len(self.depth)
        dims = (self.channels,) + tuple((2**i) * self.dim for i in range(num_stages))
        strides = (4,) + (2,) * (num_stages - 1)
        heads = to_ntuple(num_stages)(self.heads)
        windows = to_ntuple(num_stages)(self.window_size)

        for ind in range(num_stages):
            is_last = ind == num_stages - 1
            dim_out = dims[ind + 1]
            stride = strides[ind]
            ksz = stride * 2 - 1
            x = nn.Conv(
                dim_out, (ksz, ksz), strides=(stride, stride), padding=ksz // 2,
                dtype=self.dtype, name=f"s{ind}_embed",
            )(x)
            # PEG (ref :47-53)
            x = x + nn.Conv(
                dim_out, (3, 3), padding=1, feature_group_count=dim_out,
                dtype=self.dtype, name=f"s{ind}_peg",
            )(x)
            for d in range(self.depth[ind]):
                xn = _ChannelLN(dim_out, dtype=self.dtype,
                                name=f"s{ind}_b{d}_norm1")(x)
                x = x + _DSSA(
                    dim_out, heads=heads[ind], dim_head=self.dim_head,
                    window_size=windows[ind], dropout=self.dropout,
                    robust=self.robust, dtype=self.dtype, name=f"s{ind}_b{d}_attn",
                )(xn, deterministic=deterministic)
                xn = _ChannelLN(dim_out, dtype=self.dtype,
                                name=f"s{ind}_b{d}_norm2")(x)
                f = nn.Conv(dim_out * self.ff_mult, (1, 1), dtype=self.dtype,
                            name=f"s{ind}_b{d}_ff1")(xn)
                f = gelu(f)
                f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
                f = nn.Conv(dim_out, (1, 1), dtype=self.dtype,
                            name=f"s{ind}_b{d}_ff2")(f)
                f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
                x = x + f
            if not is_last:
                x = _ChannelLN(dim_out, dtype=self.dtype, name=f"s{ind}_out_norm")(x)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
