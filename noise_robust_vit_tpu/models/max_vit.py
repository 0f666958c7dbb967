"""MaxViT — MBConv + block attention + grid attention per stage
(ref max_vit.py).

Every stage block = MBConv (1×1 expand → BN → GELU → depthwise 3×3 (stride 2
on the first block of a stage) → BN → GELU → SE → 1×1 project → BN, residual
when shapes match; ref max_vit.py:90-117) followed by windowed BLOCK
attention (partition into non-overlapping w×w windows) and dilated GRID
attention (partition with stride so each group spans the whole map), both
with a learned relative-position-bias embedding (ref max_vit.py:121-205,
stage wiring :252-271).

``robust`` applies the Sinkhorn schedule inside both attentions (fork-style
extension; default off = upstream behavior). NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import ops
from ..ops import robust_softmax, gelu

__all__ = ["MaxViT"]


class _SqueezeExcitation(nn.Module):
    """(ref max_vit.py:47-62) — Linear gates, SiLU."""

    dim: int
    shrinkage_rate: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.shrinkage_rate)
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)[:, None, None, :]


class _MBConv(nn.Module):
    """(ref max_vit.py:90-117.)"""

    dim_in: int
    dim_out: int
    downsample: bool
    expansion_rate: float = 4.0
    shrinkage_rate: float = 0.25
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        hidden = int(self.expansion_rate * self.dim_out)
        stride = 2 if self.downsample else 1
        y = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="expand")(x)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn1")(y)
        y = gelu(y)
        y = nn.Conv(
            hidden, (3, 3), strides=(stride, stride), padding=1,
            feature_group_count=hidden, dtype=self.dtype, name="dwconv",
        )(y)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn2")(y)
        y = gelu(y)
        y = _SqueezeExcitation(
            hidden, self.shrinkage_rate, dtype=self.dtype, name="se"
        )(y)
        y = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="project")(y)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn3")(y)
        if self.dim_in == self.dim_out and not self.downsample:
            if self.dropout > 0 and not deterministic:
                keep = 1.0 - self.dropout
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1)
                ).astype(y.dtype)
                y = y * mask / keep
            y = y + x
        return y


class _WindowAttention(nn.Module):
    """Attention within [B', N, D]-shaped window groups with relative
    position bias (ref max_vit.py:121-205)."""

    dim: int
    dim_head: int
    window_size: int
    dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xw, *, deterministic: bool = True):
        w = self.window_size
        heads = self.dim // self.dim_head
        bw, n, _ = xw.shape
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(xw)
        q, k, v = (
            t.reshape(bw, n, heads, self.dim_head).transpose(0, 2, 1, 3)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        table = self.param(
            "rel_pos_bias", nn.initializers.normal(1.0),
            ((2 * w - 1) ** 2, heads),
        )
        pos = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
        grid = pos.reshape(2, -1).T  # [N, 2]
        rel = grid[:, None] - grid[None, :] + w - 1
        idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
        bias = table[jnp.asarray(idx)]  # [N, N, H]
        bias_hnn = bias.transpose(2, 0, 1)

        # robust fast path: K-batched fused biased kernel — the rel-pos bias
        # is one per-head operand shared by every window (num_windows=1),
        # exactly Swin's dispatch shape (round 3; ref max_vit.py:121-205)
        if (
            self.robust
            and (self.dropout == 0.0 or deterministic)
            and ops.biased_dispatch(
                self.robust, bw, heads, n, self.dim_head, self.dim_head, 1
            )
        ):
            out = ops.biased_attention(
                q, k, v, bias_hnn[None].astype(jnp.float32),
                scale=self.dim_head**-0.5, robust=True, num_windows=1,
            )
            out = out.transpose(0, 2, 1, 3).reshape(bw, n, self.dim)
            out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                           name="to_out")(out)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        # plain softmax: XLA's batched GEMMs beat a per-window fused kernel
        # at these window sizes (RESULTS.md "windowed kernel: retired")
        sim = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_head**-0.5)
        sim = sim + bias_hnn[None].astype(sim.dtype)
        attn = robust_softmax(sim, robust=self.robust)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, self.dim)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _FeedForward(nn.Module):
    dim: int
    mult: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        x = nn.Dense(inner, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class MaxViT(nn.Module):
    """(ref max_vit.py:207-288.) Constructor kwargs match the reference."""

    num_classes: int
    dim: int
    depth: Sequence[int]
    dim_head: int = 32
    dim_conv_stem: int | None = None
    window_size: int = 7
    mbconv_expansion_rate: float = 4.0
    mbconv_shrinkage_rate: float = 0.25
    dropout: float = 0.1
    channels: int = 3
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        stem = self.dim_conv_stem or self.dim
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="stem0")(x)
        x = nn.Conv(stem, (3, 3), padding=1, dtype=self.dtype, name="stem1")(x)

        w = self.window_size
        dims = (stem,) + tuple((2**i) * self.dim for i in range(len(self.depth)))
        blk = 0
        for ind, layer_depth in enumerate(self.depth):
            for stage_ind in range(layer_depth):
                is_first = stage_ind == 0
                dim_in = dims[ind] if is_first else dims[ind + 1]
                dim_out = dims[ind + 1]
                x = _MBConv(
                    dim_in, dim_out, downsample=is_first,
                    expansion_rate=self.mbconv_expansion_rate,
                    shrinkage_rate=self.mbconv_shrinkage_rate,
                    dtype=self.dtype, name=f"block{blk}_mbconv",
                )(x, deterministic=deterministic)
                b, h, wd, d = x.shape

                def _attn_ff(xw, tag):
                    xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"block{blk}_{tag}_norm1")(xw)
                    xw = xw + _WindowAttention(
                        dim_out, self.dim_head, w, self.dropout, self.robust,
                        dtype=self.dtype, name=f"block{blk}_{tag}_attn",
                    )(xn, deterministic=deterministic)
                    xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"block{blk}_{tag}_norm2")(xw)
                    return xw + _FeedForward(
                        dim_out, dropout=self.dropout, dtype=self.dtype,
                        name=f"block{blk}_{tag}_ff",
                    )(xn, deterministic=deterministic)

                # block attention: (x w1) (y w2) windows
                xb = x.reshape(b, h // w, w, wd // w, w, d)
                xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, d)
                xb = _attn_ff(xb, "blockattn")
                xb = xb.reshape(b, h // w, wd // w, w, w, d)
                x = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, d)

                # grid attention: (w1 x) (w2 y) — dilated partition
                xg = x.reshape(b, w, h // w, w, wd // w, d)
                xg = xg.transpose(0, 2, 4, 1, 3, 5).reshape(-1, w * w, d)
                xg = _attn_ff(xg, "gridattn")
                xg = xg.reshape(b, h // w, wd // w, w, w, d)
                x = xg.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, wd, d)
                blk += 1

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        if return_features:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
