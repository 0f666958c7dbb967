"""ScalableViT — Scalable Self-Attention (spatial/channel reduction) +
Interactive Windowed Self-Attention with a Local Interactive Module
(ref scalable_vit.py).

Per layer: SSA (keys/values spatially reduced by a strided conv,
ref scalable_vit.py:79-129), conv-FFN, a PEG after the first layer, IWSA
(windowed attention whose output is summed with a 3×3 conv of the values —
the LIM, ref :131-195), conv-FFN. Stages downsample by strided 3×3 conv
(ref :46-52)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import to_ntuple
from .cvt import _ChannelLN

__all__ = ["ScalableViT"]


class _SSA(nn.Module):
    dim: int
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 32
    reduction_factor: int = 1
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, h, w, _ = x.shape
        r = self.reduction_factor
        q = nn.Conv(self.dim_key * self.heads, (1, 1), use_bias=False,
                    dtype=self.dtype, name="to_q")(x)
        k = nn.Conv(self.dim_key * self.heads, (r, r), strides=(r, r),
                    use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Conv(self.dim_value * self.heads, (r, r), strides=(r, r),
                    use_bias=False, dtype=self.dtype, name="to_v")(x)

        def split(t, d):
            bb, hh, ww, _ = t.shape
            return t.reshape(bb, hh * ww, self.heads, d).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q, self.dim_key), split(k, self.dim_key), split(v, self.dim_value)
        dots = jnp.einsum(
            "bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32
        ) * (self.dim_key**-0.5)
        attn = robust_softmax(dots, robust=self.robust)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(vh.dtype), vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim_value * self.heads)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _IWSA(nn.Module):
    dim: int
    window_size: Optional[int]
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 32
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, h, w, _ = x.shape
        wh = self.window_size or h
        ww_ = self.window_size or w
        inner_v = self.dim_value * self.heads
        q = nn.Conv(self.dim_key * self.heads, (1, 1), use_bias=False,
                    dtype=self.dtype, name="to_q")(x)
        k = nn.Conv(self.dim_key * self.heads, (1, 1), use_bias=False,
                    dtype=self.dtype, name="to_k")(x)
        v = nn.Conv(inner_v, (1, 1), use_bias=False, dtype=self.dtype,
                    name="to_v")(x)
        # Local Interactive Module (ref :148, :192-193)
        local_out = nn.Conv(inner_v, (3, 3), padding=1, dtype=self.dtype,
                            name="lim")(v)

        def windows(t, d):
            t = t.reshape(b, h // wh, wh, w // ww_, ww_, self.heads, d)
            t = t.transpose(0, 1, 3, 5, 2, 4, 6)
            return t.reshape(-1, self.heads, wh * ww_, d)

        qh = windows(q.reshape(b, h, w, self.heads, self.dim_key), self.dim_key)
        kh = windows(k.reshape(b, h, w, self.heads, self.dim_key), self.dim_key)
        vh = windows(v.reshape(b, h, w, self.heads, self.dim_value), self.dim_value)
        dots = jnp.einsum(
            "bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32
        ) * (self.dim_key**-0.5)
        attn = robust_softmax(dots, robust=self.robust)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(vh.dtype), vh)
        out = out.reshape(b, h // wh, w // ww_, self.heads, wh, ww_, self.dim_value)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, h, w, inner_v)
        out = out + local_out
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _ConvFF(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Conv(self.dim * self.mult, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ScalableViT(nn.Module):
    """(ref scalable_vit.py:241-306.)"""

    num_classes: int
    dim: int
    depth: Sequence[int]
    heads: Any
    reduction_factor: Any
    window_size: Any = None
    iwsa_dim_key: Any = 32
    iwsa_dim_value: Any = 32
    ssa_dim_key: Any = 32
    ssa_dim_value: Any = 32
    ff_expansion_factor: int = 4
    channels: int = 3
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        x = nn.Conv(self.dim, (7, 7), strides=(4, 4), padding=3,
                    dtype=self.dtype, name="to_patches")(img)
        n_stages = len(self.depth)
        tup = to_ntuple(n_stages)
        heads = tup(self.heads)
        ssa_k, ssa_v = tup(self.ssa_dim_key), tup(self.ssa_dim_value)
        red = tup(self.reduction_factor)
        iw_k, iw_v = tup(self.iwsa_dim_key), tup(self.iwsa_dim_value)
        wins = tup(self.window_size)
        dims = tuple((2**i) * self.dim for i in range(n_stages))

        for s in range(n_stages):
            dim = dims[s]
            is_last = s == n_stages - 1
            for d in range(self.depth[s]):
                xn = _ChannelLN(dim, dtype=self.dtype, name=f"s{s}_b{d}_n1")(x)
                x = x + _SSA(
                    dim, heads[s], ssa_k[s], ssa_v[s], red[s], self.dropout,
                    self.robust, dtype=self.dtype, name=f"s{s}_b{d}_ssa",
                )(xn, deterministic=deterministic)
                xn = _ChannelLN(dim, dtype=self.dtype, name=f"s{s}_b{d}_n2")(x)
                x = x + _ConvFF(dim, self.ff_expansion_factor, self.dropout,
                                dtype=self.dtype, name=f"s{s}_b{d}_ff1")(
                    xn, deterministic=deterministic
                )
                if d == 0:
                    # PEG after the first layer (ref :218-220)
                    x = x + nn.Conv(
                        dim, (3, 3), padding=1, feature_group_count=dim,
                        dtype=self.dtype, name=f"s{s}_peg",
                    )(x)
                xn = _ChannelLN(dim, dtype=self.dtype, name=f"s{s}_b{d}_n3")(x)
                x = x + _IWSA(
                    dim, wins[s], heads[s], iw_k[s], iw_v[s], self.dropout,
                    self.robust, dtype=self.dtype, name=f"s{s}_b{d}_iwsa",
                )(xn, deterministic=deterministic)
                xn = _ChannelLN(dim, dtype=self.dtype, name=f"s{s}_b{d}_n4")(x)
                x = x + _ConvFF(dim, self.ff_expansion_factor, self.dropout,
                                dtype=self.dtype, name=f"s{s}_b{d}_ff2")(
                    xn, deterministic=deterministic
                )
            if not is_last:
                x = _ChannelLN(dim, dtype=self.dtype, name=f"s{s}_out_norm")(x)
                x = nn.Conv(dim * 2, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f"s{s}_down")(x)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
