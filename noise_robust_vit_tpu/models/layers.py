"""Shared flax.linen building blocks for the model zoo.

These map the reference's per-model ``FeedForward`` / ``Attention`` /
``Transformer`` trios (e.g. ref simple_vit.py:34-97, cait.py, deepvit.py) onto
one parameterizable set of modules. TPU-first details:

  * compute dtype is a module field (``dtype``), bf16 for the MXU in
    production; params stay float32 (``param_dtype``);
  * attention dispatches to the fused Pallas kernel via
    ``ops.dot_product_attention``;
  * attention-map introspection (the reference's hook-based Recorder,
    ref recorder.py:12-61) is functional: under ``recording()`` the attention
    module sows its weights into the 'intermediates' collection.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import gelu

from .. import ops
from ..parallel.tp import constrain_activation
from ..utils import trunc_normal_init

_REC = threading.local()


def _ln_cls():
    """LayerNorm class for the shared blocks — ``NRV_FUSED_LN=1`` swaps in
    the one-pass Pallas kernel module (param-compatible; the VERDICT-r2 #9
    experiment, see ops/pallas/fused_ln.py and RESULTS.md)."""
    import os

    if os.environ.get("NRV_FUSED_LN"):
        from ..ops.norms import FusedLayerNorm

        return FusedLayerNorm
    return nn.LayerNorm


@contextlib.contextmanager
def recording():
    """While active, ``Attention`` modules sow their attention weights into
    the 'intermediates' collection (apply with ``mutable=['intermediates']``).
    Functional replacement for the reference's forward hooks
    (ref recorder.py:12-61, extractor.py:18-90)."""
    prev = getattr(_REC, "on", False)
    _REC.on = True
    try:
        yield
    finally:
        _REC.on = prev


def is_recording() -> bool:
    return getattr(_REC, "on", False)


class FeedForward(nn.Module):
    """LayerNorm → Dense → act → Dense (+dropout) (ref simple_vit.py:34-45).
    ``act`` defaults to GELU; MobileViT's transformer uses SiLU
    (ref mobile_vit.py:39-41)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    pre_norm: bool = True
    act: Callable = gelu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.pre_norm:
            x = _ln_cls()(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = constrain_activation(x, "data", None, "model")
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with optional Sinkhorn ("robust")
    normalization (ref simple_vit.py:48-76; robust branch :56-59).

    ``robust=True`` replaces the row softmax with softmax + 3 alternating
    row/column renormalizations + a final row normalization
    (ref utils.py:1025-1037)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    robust: bool = False
    qkv_bias: bool = False
    out_bias: bool = False
    pre_norm: bool = True
    sinkhorn_iters: int = 3
    final_row_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, context=None, mask=None, deterministic: bool = True):
        inner = self.heads * self.dim_head
        if self.pre_norm:
            x = _ln_cls()(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        context = x if context is None else context

        b, n = x.shape[0], x.shape[1]
        m = context.shape[1]
        # attention-weights dropout fires in train mode (the lucidrains
        # convention drops ON the normalized attention matrix before @v,
        # ref vit_for_small_dataset.py:64-65, deepvit.py; cait.py already
        # matched) — the fused kernels only serve the dropout-free path
        attn_drop = self.dropout > 0.0 and not deterministic
        if context is x:
            qkv = nn.Dense(inner * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="to_qkv")(x)
            if (
                mask is None
                and not is_recording()
                and not attn_drop
                and ops.packed_dispatch(self.robust, n, self.dim_head, self.heads, b)
            ):
                # packed fused kernel: consumes the qkv projection layout
                # directly and emits the to_out layout — no transpose/pad
                # boundary for XLA to schedule around (round-2 fast path)
                qkv = constrain_activation(qkv, "data", None, "model")
                out = ops.packed_attention(
                    qkv, self.heads, self.dim_head,
                    scale=self.dim_head**-0.5,
                    robust=self.robust,
                    sinkhorn_iters=self.sinkhorn_iters,
                    final_row_norm=self.final_row_norm,
                )
                out = constrain_activation(out, "data", None, "model")
                out = nn.Dense(self.dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out")(out)
                return nn.Dropout(self.dropout)(out, deterministic=deterministic)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(x)
            kv = nn.Dense(inner * 2, use_bias=self.qkv_bias, dtype=self.dtype, name="to_kv")(context)
            k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        # Megatron TP: pin the per-head activations to the model axis so the
        # partitioner keeps head-sharded attention instead of resharding
        # (no-op outside a tp_shardings_active context)
        q = constrain_activation(q, "data", "model", None, None)
        k = constrain_activation(k, "data", "model", None, None)
        v = constrain_activation(v, "data", "model", None, None)

        if is_recording() or attn_drop:
            attn = ops.attention_weights(
                q, k,
                scale=self.dim_head**-0.5,
                mask=mask,
                robust=self.robust,
                sinkhorn_iters=self.sinkhorn_iters,
                final_row_norm=self.final_row_norm,
            )
            if is_recording():
                self.sow("intermediates", "attn", attn)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
        else:
            out = ops.dot_product_attention(
                q, k, v,
                scale=self.dim_head**-0.5,
                mask=mask,
                robust=self.robust,
                sinkhorn_iters=self.sinkhorn_iters,
                final_row_norm=self.final_row_norm,
            )

        out = constrain_activation(out, "data", "model", None, None)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = constrain_activation(out, "data", None, "model")
        out = nn.Dense(self.dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class Transformer(nn.Module):
    """Pre-norm residual stack of (Attention, FeedForward) pairs
    (ref simple_vit.py:79-97)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    robust: bool = False
    final_norm: bool = False
    # bias conventions differ upstream: the simple_vit family uses bias-free
    # to_out (ref simple_vit.py:62), the standard lucidrains zoo uses
    # nn.Linear defaults (bias=True) — callers pick
    qkv_bias: bool = False
    out_bias: bool = False
    ff_act: Callable = gelu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.depth):
            x = Attention(
                self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                robust=self.robust,
                qkv_bias=self.qkv_bias,
                out_bias=self.out_bias,
                dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(x, deterministic=deterministic) + x
            x = FeedForward(
                self.dim,
                self.mlp_dim,
                dropout=self.dropout,
                act=self.ff_act,
                dtype=self.dtype,
                name=f"layers_{i}_ff",
            )(x, deterministic=deterministic) + x
            self.sow("intermediates", "block_out", x)
        if self.final_norm:
            x = _ln_cls()(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class PatchEmbed(nn.Module):
    """Fused patchify + linear embedding (ref simple_vit.py:126-131:
    ``Rearrange('b c (h p1) (w p2) -> b h w (p1 p2 c)')`` + Linear).

    Input is NHWC (TPU-native layout). The rearrange+matmul pair is exactly
    what XLA fuses into a single strided GEMM on the MXU. Feature order of the
    flattened patch is (p1, p2, c), matching the reference so ported weights
    line up."""

    dim: int
    patch_size: tuple[int, int]
    bias: bool = True
    flatten: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ph, pw = self.patch_size
        gh, gw = h // ph, w // pw
        x = x.reshape(b, gh, ph, gw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, ph * pw * c)
        x = nn.Dense(self.dim, use_bias=self.bias, dtype=self.dtype, name="proj")(x)
        if self.flatten:
            x = x.reshape(b, gh * gw, self.dim)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth module (ref utils.py:1100-1112)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return ops.drop_path(x, self.rate, self.make_rng("dropout"))


class LayerScale(nn.Module):
    """Learned per-channel residual scaling γ·x (ref cait.py:36,
    patch_convnet.py:211-212)."""

    dim: int
    init_value: float = 1e-4

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class SqueezeExcite(nn.Module):
    """Squeeze-and-Excitation over NHWC feature maps (ref utils.py:1148-1184)."""

    channels: int
    rd_ratio: float = 1.0 / 16
    rd_divisor: Optional[int] = None
    gate: Callable = jax.nn.sigmoid
    act: Callable = jax.nn.relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # reference: rd_channels = round(in_chs * rd_ratio) — no divisor
        # rounding (ref utils.py:1165)
        if self.rd_divisor is None:
            rd = round(self.channels * self.rd_ratio)
        else:
            rd = int(self.channels * self.rd_ratio)
            rd = max(self.rd_divisor, (rd + self.rd_divisor // 2) // self.rd_divisor * self.rd_divisor)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(rd, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = self.act(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * self.gate(s)


def posemb_init(std: float = 0.02):
    return trunc_normal_init(std=std)
