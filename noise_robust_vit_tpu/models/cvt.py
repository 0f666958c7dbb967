"""CvT — Convolutions-to-Vision-Transformers (ref cvt.py).

Three stages; each = strided conv embedding + channel LayerNorm + transformer
whose q/k/v projections are depthwise-conv (+BN +1×1) with a stride on k/v
for token reduction (ref cvt.py:70-102); FeedForward is 1×1 convs
(ref cvt.py:47-57). Operates on NHWC maps end to end; head = global average
pool + linear (ref cvt.py:168-177)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import gelu, robust_softmax, streaming_attention, streaming_dispatch

__all__ = ["CvT"]


class _DWConvProj(nn.Module):
    """Depthwise conv + BN + pointwise conv (ref cvt.py:59-68)."""

    dim_out: int
    kernel: int
    stride: int
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = x.shape[-1]
        x = nn.Conv(
            c, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=self.kernel // 2, feature_group_count=c, use_bias=self.bias,
            dtype=self.dtype, name="dw",
        )(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn")(x)
        return nn.Conv(
            self.dim_out, (1, 1), use_bias=self.bias, dtype=self.dtype, name="pw"
        )(x)


class _CvtAttention(nn.Module):
    """(ref cvt.py:70-102.)"""

    dim: int
    proj_kernel: int
    kv_proj_stride: int
    heads: int
    dim_head: int
    dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, h, w, _ = x.shape
        inner = self.heads * self.dim_head
        q = _DWConvProj(inner, self.proj_kernel, 1, dtype=self.dtype, name="to_q")(
            x, deterministic=deterministic
        )
        kv = _DWConvProj(
            inner * 2, self.proj_kernel, self.kv_proj_stride,
            dtype=self.dtype, name="to_kv",
        )(x, deterministic=deterministic)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            bb, hh, ww, cc = t.shape
            t = t.reshape(bb, hh * ww, self.heads, self.dim_head)
            return t.transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        # Giant-N robust fast path (stage-1 is 3136 queries × 784 keys at
        # 224px): the streaming q/k/v-interface kernel never materializes
        # the N×M matrix in HBM or VMEM — the resident logits-interface
        # kernels architecturally cannot hold stage-1's chain (round-4
        # "CvT stage-1 analysis"). Attention dropout fires ON the matrix
        # (ref cvt.py:95-97), so the fused path only applies when dropout
        # is inactive.
        if (self.robust and (deterministic or self.dropout == 0.0)
                and streaming_dispatch(True, b, self.heads, q.shape[2],
                                       k.shape[2], self.dim_head)):
            out = streaming_attention(q, k, v, scale=self.dim_head**-0.5)
        else:
            dots = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * (self.dim_head**-0.5)
            attn = robust_softmax(dots, robust=self.robust)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _ChannelLN(nn.Module):
    """LayerNorm over the channel axis of an NHWC map (ref cvt.py:25-35;
    biased variance, matching the reference)."""

    dim: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * g.astype(x.dtype) + b.astype(x.dtype)


class CvT(nn.Module):
    num_classes: int
    s1_emb_dim: int = 64
    s1_emb_kernel: int = 7
    s1_emb_stride: int = 4
    s1_proj_kernel: int = 3
    s1_kv_proj_stride: int = 2
    s1_heads: int = 1
    s1_depth: int = 1
    s1_mlp_mult: int = 4
    s2_emb_dim: int = 192
    s2_emb_kernel: int = 3
    s2_emb_stride: int = 2
    s2_proj_kernel: int = 3
    s2_kv_proj_stride: int = 2
    s2_heads: int = 3
    s2_depth: int = 2
    s2_mlp_mult: int = 4
    s3_emb_dim: int = 384
    s3_emb_kernel: int = 3
    s3_emb_stride: int = 2
    s3_proj_kernel: int = 3
    s3_kv_proj_stride: int = 2
    s3_heads: int = 6
    s3_depth: int = 10
    s3_mlp_mult: int = 4
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        for s in (1, 2, 3):
            cfg = {
                k: getattr(self, f"s{s}_{k}")
                for k in ("emb_dim", "emb_kernel", "emb_stride", "proj_kernel",
                          "kv_proj_stride", "heads", "depth", "mlp_mult")
            }
            x = nn.Conv(
                cfg["emb_dim"], (cfg["emb_kernel"], cfg["emb_kernel"]),
                strides=(cfg["emb_stride"], cfg["emb_stride"]),
                padding=cfg["emb_kernel"] // 2, dtype=self.dtype,
                name=f"s{s}_embed",
            )(x)
            x = _ChannelLN(cfg["emb_dim"], dtype=self.dtype, name=f"s{s}_norm")(x)
            for d in range(cfg["depth"]):
                xn = _ChannelLN(cfg["emb_dim"], dtype=self.dtype,
                                name=f"s{s}_b{d}_norm1")(x)
                x = x + _CvtAttention(
                    # dim_head is FIXED at 64 upstream (ref cvt.py:105 —
                    # CvT never passes dim_head through), not emb_dim/heads
                    cfg["emb_dim"], cfg["proj_kernel"], cfg["kv_proj_stride"],
                    cfg["heads"], 64, self.dropout,
                    self.robust, dtype=self.dtype, name=f"s{s}_b{d}_attn",
                )(xn, deterministic=deterministic)
                xn = _ChannelLN(cfg["emb_dim"], dtype=self.dtype,
                                name=f"s{s}_b{d}_norm2")(x)
                f = nn.Conv(cfg["emb_dim"] * cfg["mlp_mult"], (1, 1),
                            dtype=self.dtype, name=f"s{s}_b{d}_ff1")(xn)
                f = gelu(f)
                f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
                f = nn.Conv(cfg["emb_dim"], (1, 1), dtype=self.dtype,
                            name=f"s{s}_b{d}_ff2")(f)
                f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
                x = x + f

        x = jnp.mean(x, axis=(1, 2))
        if return_features:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
