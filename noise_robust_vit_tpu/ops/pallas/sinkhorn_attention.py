"""Fused attention kernel (softmax or Sinkhorn-renormalized) for TPU.

One Pallas program per (batch, head): computes ``q @ k^T``, normalizes —
plain row softmax, or softmax followed by alternating row/column Sinkhorn
renormalizations (the reference's "robust" attention,
ref vit_pytorch_robust/utils.py:1025-1037 and utils.py:218-224) — and
multiplies by ``v``, all without the N×N attention matrix ever leaving VMEM.

Why not flash attention for the robust path: Sinkhorn's column normalization
needs full column sums of the attention matrix, which breaks the streaming
softmax invariant (see SURVEY.md §7.3). At the sequence lengths the reference
models use globally (N ≤ ~3k; N = 197 for ViT-B/16 @224) the whole matrix
fits in VMEM, so a materialize-in-VMEM kernel is both simpler and faster than
any two-pass blockwise scheme.

Sequence/head-dim are padded to hardware tiles inside the wrapper; padded
rows/columns are masked to zero after the softmax so they contribute nothing
to Sinkhorn's row/column sums, and all-zero padded rows/columns divide by a
`where`-guarded denominator (sum==0 → 1) so valid entries see the exact
reference arithmetic with no epsilon perturbation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention"]

_LANE = 128
# VMEM budget: scores f32 (Np*Np*4) dominates; cap Np so scores+io < ~12MB.
_MAX_N_PAD = 1536
_MAX_D_PAD = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n, robust, iters, final_row):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    n_pad = q.shape[0]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    needs_mask = n != n_pad
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        s = jnp.where(col < n, s, -1e9)

    attn = jax.nn.softmax(s, axis=-1)

    if needs_mask:
        row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
        attn = jnp.where((row < n) & (col < n), attn, 0.0)

    if robust:

        def _div(a, axis):
            s = jnp.sum(a, axis=axis, keepdims=True)
            if needs_mask:
                s = jnp.where(s == 0.0, 1.0, s)
            return a / s

        for _ in range(iters):
            attn = _div(attn, -1)
            attn = _div(attn, -2)
        if final_row:
            attn = _div(attn, -1)

    o_ref[0] = jax.lax.dot_general(
        attn.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "robust", "sinkhorn_iters", "final_row_norm"),
)
def _fused_attention_impl(q, k, v, scale, robust, sinkhorn_iters, final_row_norm):
    *batch, n, d = q.shape
    dv = v.shape[-1]
    bh = 1
    for b in batch:
        bh *= b
    q = q.reshape(bh, n, d)
    k = k.reshape(bh, n, d)
    v = v.reshape(bh, n, dv)

    n_pad = _round_up(n, _LANE)
    d_pad = _round_up(d, _LANE)
    dv_pad = _round_up(dv, _LANE)
    if n_pad != n or d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
        k = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    if n_pad != n or dv_pad != dv:
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, dv_pad - dv)))

    kernel = functools.partial(
        _kernel,
        scale=scale,
        n=n,
        robust=robust,
        iters=sinkhorn_iters,
        final_row=final_row_norm,
    )
    flops_norm = n_pad * n_pad * (4 + (6 * sinkhorn_iters if robust else 0))
    out = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, dv_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_pad, dv_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, dv_pad), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=bh * (2 * n_pad * n_pad * (d_pad + dv_pad) + flops_norm),
            bytes_accessed=bh * n_pad * (2 * d_pad + 2 * dv_pad) * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
    )(q, k, v)
    out = out[:, :n, :dv]
    return out.reshape(*batch, n, dv)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    bias: jax.Array | None = None,
    mask: jax.Array | None = None,
    robust: bool = False,
    sinkhorn_iters: int = 3,
    final_row_norm: bool = True,
) -> jax.Array | None:
    """Fused attention, or ``None`` when these shapes/features are unsupported
    (caller falls back to the pure-JAX path in ``ops/attention.py``)."""
    if bias is not None or mask is not None:
        return None  # bias/mask variants use the XLA path (windowed models)
    if q.ndim < 2 or q.shape[-2] != k.shape[-2] or q.shape != k.shape:
        return None  # self-attention with equal q/k lengths only
    n, d = q.shape[-2], q.shape[-1]
    if _round_up(n, _LANE) > _MAX_N_PAD or _round_up(d, _LANE) > _MAX_D_PAD:
        return None
    if _round_up(v.shape[-1], _LANE) > _MAX_D_PAD:
        return None
    if scale is None:
        scale = d**-0.5
    return _fused_attention_impl(
        q, k, v, float(scale), bool(robust), int(sinkhorn_iters), bool(final_row_norm)
    )
