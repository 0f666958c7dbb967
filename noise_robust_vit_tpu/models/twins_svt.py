"""Twins-SVT — alternating local windowed + global subsampled attention with
PEG positional encoding (ref twins_svt.py).

Four stages; each: patch embedding (space-to-depth + 1×1 conv,
ref twins_svt.py:68-79), one transformer layer, a PEG (residual depthwise
conv positional encoding, ref :81-88), then ``depth`` more layers. A layer =
LocalAttention within p×p windows (ref :89-120; absent in the last stage) and
GlobalAttention with k-strided conv-subsampled keys/values (ref :122-153),
each with a conv FFN. Channel-LN pre-norms (ref :33-53). NHWC."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from ..ops import robust_softmax, gelu
from .cvt import _ChannelLN

__all__ = ["TwinsSVT"]


def _mh_attention(q, k, v, heads, dim_head, robust):
    """q [B,Nq,inner], k/v [B,Nk,inner] → [B,Nq,inner]."""
    b, nq, _ = q.shape
    nk = k.shape[1]
    q = q.reshape(b, nq, heads, dim_head).transpose(0, 2, 1, 3)
    k = k.reshape(b, nk, heads, dim_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, nk, heads, dim_head).transpose(0, 2, 1, 3)
    # Stage-1 GlobalAttention is 3136 queries × 64 subsampled keys at
    # 224px (ref twins_svt.py:122-153): too tall for the resident
    # logits-interface kernels — the streaming q/k/v kernel recomputes
    # exp(q·kᵀ−lse) tiles instead of HBM-round-tripping the N×M matrix.
    if robust and ops.streaming_dispatch(True, b, heads, nq, nk, dim_head):
        out = ops.streaming_attention(q, k, v, scale=dim_head**-0.5)
    else:
        dots = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (dim_head**-0.5)
        attn = robust_softmax(dots, robust=robust)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, heads * dim_head)


class _LocalAttention(nn.Module):
    """(ref twins_svt.py:89-120.)"""

    dim: int
    heads: int = 8
    dim_head: int = 64
    patch_size: int = 7
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        p = self.patch_size
        b, hh, ww, _ = x.shape
        inner = self.heads * self.dim_head
        q = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Conv(inner * 2, (1, 1), use_bias=False, dtype=self.dtype,
                     name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        def to_windows(t):
            t = t.reshape(b, hh // p, p, ww // p, p, inner)
            t = t.transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(b * (hh // p) * (ww // p), p * p, inner)

        qw, kw, vw = to_windows(q), to_windows(k), to_windows(v)
        n = p * p
        bw = qw.shape[0]
        # robust fast path: the K-batched fused biased kernel (zero bias) —
        # the XLA composition materializes [BW, H, 49, 49] f32 logits AND
        # stores the doubly-stochastic weights as bwd residuals, ~3× tile-
        # padded in HBM (measured 16.85G > 16G at bs128: stage-1 runs 8192
        # windows); the kernel keeps the matrix in VMEM and stores only the
        # scaling-vector/lse rows (ref twins_svt.py:89-120)
        # The PLAIN-softmax local attention ALSO takes the fused kernel by
        # default: the round-1 "XLA overlaps better for vanilla" lesson was
        # measured on ViT-B global attention, not an 8192-window graph.
        # Measured on-chip (round 5): vanilla 278.4 → 344.4 img/s (+24%),
        # no-bias plain fwd+bwd verified on the chip (tpu_kernel_check
        # --only nobias). NRV_NO_FUSED_PLAIN_LOCAL opts back to XLA.
        import os as _os

        fuse_local = self.robust or not _os.environ.get(
            "NRV_NO_FUSED_PLAIN_LOCAL")
        if fuse_local and ops.biased_dispatch(
            True, bw, self.heads, n, self.dim_head, self.dim_head, 1
        ):
            def split_heads(t):
                return t.reshape(
                    bw, n, self.heads, self.dim_head
                ).transpose(0, 2, 1, 3)

            out = ops.biased_attention(
                split_heads(qw), split_heads(kw), split_heads(vw),
                jnp.zeros((1, self.heads, n, n), jnp.float32),
                scale=self.dim_head**-0.5, robust=self.robust,
                num_windows=1, no_bias=True,
            )
            out = out.transpose(0, 2, 1, 3).reshape(bw, n, inner)
        else:
            out = _mh_attention(
                qw, kw, vw, self.heads, self.dim_head, self.robust,
            )
        out = out.reshape(b, hh // p, ww // p, p, p, inner)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, inner)
        out = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _GlobalAttention(nn.Module):
    """(ref twins_svt.py:122-153.)"""

    dim: int
    heads: int = 8
    dim_head: int = 64
    k: int = 7
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, hh, ww, _ = x.shape
        inner = self.heads * self.dim_head
        q = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Conv(
            inner * 2, (self.k, self.k), strides=(self.k, self.k),
            use_bias=False, dtype=self.dtype, name="to_kv",
        )(x)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _mh_attention(
            q.reshape(b, hh * ww, inner),
            k.reshape(b, -1, inner),
            v.reshape(b, -1, inner),
            self.heads, self.dim_head, self.robust,
        )
        out = out.reshape(b, hh, ww, inner)
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


class _TwinsLayer(nn.Module):
    dim: int
    local_patch_size: int
    global_k: int
    dropout: float
    has_local: bool
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.has_local:
            xn = _ChannelLN(self.dim, dtype=self.dtype, name="ln_local")(x)
            x = x + _LocalAttention(
                self.dim, patch_size=self.local_patch_size,
                dropout=self.dropout, robust=self.robust, dtype=self.dtype,
                name="local_attn",
            )(xn, deterministic=deterministic)
            xn = _ChannelLN(self.dim, dtype=self.dtype, name="ln_ff1")(x)
            x = x + _ConvFF(self.dim, dropout=self.dropout, dtype=self.dtype,
                            name="ff1")(xn, deterministic=deterministic)
        xn = _ChannelLN(self.dim, dtype=self.dtype, name="ln_global")(x)
        x = x + _GlobalAttention(
            self.dim, k=self.global_k, dropout=self.dropout, robust=self.robust,
            dtype=self.dtype, name="global_attn",
        )(xn, deterministic=deterministic)
        xn = _ChannelLN(self.dim, dtype=self.dtype, name="ln_ff2")(x)
        return x + _ConvFF(self.dim, dropout=self.dropout, dtype=self.dtype,
                           name="ff2")(xn, deterministic=deterministic)


class TwinsSVT(nn.Module):
    """(ref twins_svt.py:175-232.)"""

    num_classes: int
    s1_emb_dim: int = 64
    s1_patch_size: int = 4
    s1_local_patch_size: int = 7
    s1_global_k: int = 7
    s1_depth: int = 1
    s2_emb_dim: int = 128
    s2_patch_size: int = 2
    s2_local_patch_size: int = 7
    s2_global_k: int = 7
    s2_depth: int = 1
    s3_emb_dim: int = 256
    s3_patch_size: int = 2
    s3_local_patch_size: int = 7
    s3_global_k: int = 7
    s3_depth: int = 5
    s4_emb_dim: int = 512
    s4_patch_size: int = 2
    s4_local_patch_size: int = 7
    s4_global_k: int = 7
    s4_depth: int = 4
    peg_kernel_size: int = 3
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        for s in (1, 2, 3, 4):
            cfg = {
                key: getattr(self, f"s{s}_{key}")
                for key in ("emb_dim", "patch_size", "local_patch_size",
                            "global_k", "depth")
            }
            is_last = s == 4
            # patch embedding: space-to-depth (c p1 p2 order) + 1×1 conv
            b, hh, ww, c = x.shape
            p = cfg["patch_size"]
            t = x.reshape(b, hh // p, p, ww // p, p, c)
            t = t.transpose(0, 1, 3, 5, 2, 4).reshape(
                b, hh // p, ww // p, c * p * p
            )
            x = nn.Conv(cfg["emb_dim"], (1, 1), dtype=self.dtype,
                        name=f"s{s}_embed")(t)
            x = _TwinsLayer(
                cfg["emb_dim"], cfg["local_patch_size"], cfg["global_k"],
                self.dropout, not is_last, self.robust, dtype=self.dtype,
                name=f"s{s}_pre",
            )(x, deterministic=deterministic)
            # PEG: residual depthwise conv (ref :81-88)
            x = x + nn.Conv(
                cfg["emb_dim"], (self.peg_kernel_size, self.peg_kernel_size),
                padding=self.peg_kernel_size // 2,
                feature_group_count=cfg["emb_dim"], dtype=self.dtype,
                name=f"s{s}_peg",
            )(x)
            for d in range(cfg["depth"]):
                x = _TwinsLayer(
                    cfg["emb_dim"], cfg["local_patch_size"], cfg["global_k"],
                    self.dropout, not is_last, self.robust, dtype=self.dtype,
                    name=f"s{s}_layer{d}",
                )(x, deterministic=deterministic)

        x = jnp.mean(x, axis=(1, 2))
        if return_features:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
