"""Fused softmax + Sinkhorn normalization over PRECOMPUTED logits.

The packed/biased kernels cover models whose attention is a standard
q·kᵀ → normalize → ·v sandwich. A dozen zoo models are NOT that shape —
they transform the attention matrix between the softmax and the value
matmul (CaiT's talking-heads mixing, ref cait.py:110-119; DeepViT's
re-attention, ref deepvit.py:61-75), pool/merge it (PiT, RegionViT), or
build the logits from non-GEMM paths — so they call
``ops.sinkhorn.robust_softmax`` on an explicit [..., N, N] logits tensor
and pay XLA's vector-form Sinkhorn: every row/col reduction of the chain
re-reads the N² matrix from HBM (~4·iters sequential round-trips, plus the
softmax's own passes).

This kernel fuses softmax + the full Sinkhorn chain into ONE VMEM
residency of the matrix: logits in, doubly-stochastic weights out. The
math is the scaling-vector form shared with the attention kernels
(`sinkhorn_attention._fwd_math_batched`'s chain), K-batched over a leading
(batch·head) group so the chain's sequential tiny-vector reductions keep
the VPU pipeline full (the round-2 chain-batching recipe). The backward
reuses the LEAN reverse chain (`_reverse_chain_inner`) with the residual
scaling-vector stack + stored softmax log-normalizer, so the bwd is a
single fused pass too: attn rebuilt via one exp, direct grads via one
elementwise product + two matvecs, rank-1 terms applied as one MXU matmul.

Semantics: identical to ``sinkhorn_attention(logits)`` (softmax then
``sinkhorn_normalize``; ref vit_pytorch_robust/utils.py:1025-1037). The
first row normalization is skipped — rowsum(softmax) ≡ 1 in value AND in
gradient w.r.t. the logits, the same identity the attention kernels use.
Square matrices only (self-attention); rectangular (cross-attention)
callers keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_attention import _num_vecs, _vec_rows
from .sinkhorn_attention import (
    _compiler_params,
    _restore_vec_rows,
    _reverse_chain_inner,
    _round_up,
)

__all__ = [
    "sinkhorn_softmax",
    "sinkhorn_softmax_supported",
    "sinkhorn_softmax_rect",
    "sinkhorn_softmax_rect_supported",
]

import os as _os

_VMEM_BUDGET = int(_os.environ.get("NRV_KERNEL_VMEM_BUDGET", 17.5 * 1024 * 1024))
# Largest padded N the kernel accepts: the bwd keeps ~6 N² f32 buffers live
# per batched item, so cap p where even a single-item group fits the budget.
_MAX_P = 640


def _pick_g(r: int, p: int, bufs: int) -> int:
    """Largest divisor of ``r`` whose [g, p, p] chain scratch fits the VMEM
    budget (Mosaic scoped allocation, per-item accounting)."""
    per_item = bufs * p * p * 4 + 16 * p * 4
    for g in (16, 12, 8, 6, 4, 3, 2, 1):
        if r % g:
            continue
        if g * per_item <= _VMEM_BUDGET:
            return g
    return 1


def _recip_fn(needs_mask: bool):
    def _recip(x):
        # clamped reciprocal (see ops/sinkhorn.py::sinkhorn_scalings)
        if not needs_mask:
            return 1.0 / jnp.maximum(x, 1e-8)
        safe = jnp.where(x == 0.0, 1.0, jnp.maximum(x, 1e-8))
        return jnp.where(x == 0.0, 1.0, 1.0 / safe)

    return _recip


def _norm_fwd_math(s, *, n, iters, final_row, want_vecs):
    """softmax + Sinkhorn chain on padded logits ``s [K, p, p]`` (f32).
    Returns the normalized matrix (and the residual stack: a-rows, b-rows,
    lse row). The unnormalized e = exp(s − m) is the only N² intermediate;
    the row normalizer and Sinkhorn scalings stay per-row/col vectors and
    multiply into the single output pass."""
    kb, p, _ = s.shape
    needs_mask = n != p
    if needs_mask:
        col2 = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
        s = jnp.where(col2[None] < n, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = jnp.sum(e, axis=-1, keepdims=True)
    lse_row = (m + jnp.log(r)).reshape(kb, 1, p) if want_vecs else None
    inv_r = 1.0 / r
    if needs_mask:
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) < n)[None]
        inv_r = jnp.where(rowmask, inv_r, 0.0)
    _recip = _recip_fn(needs_mask)
    a_rows, b_rows = [], []
    a_scale = inv_r
    b = jnp.ones((kb, 1, p), jnp.float32)
    for i in range(iters):
        # i == 0: rowsum(softmax) ≡ 1 (value and gradient) — identity
        if i > 0:
            a = _recip(jnp.sum(e * b, axis=-1, keepdims=True) * inv_r)
            a_rows.append(a.reshape(kb, 1, p))
            a_scale = a * inv_r
        b = _recip(jnp.sum(e * a_scale, axis=-2, keepdims=True))
        b_rows.append(b)
    if final_row:
        a = _recip(jnp.sum(e * b, axis=-1, keepdims=True) * inv_r)
        a_rows.append(a.reshape(kb, 1, p))
        a_scale = a * inv_r
    out = e * a_scale * b
    if want_vecs:
        return out, jnp.concatenate(a_rows + b_rows + [lse_row], axis=1)
    return out


def _norm_bwd_math(s, g, vecs, *, n, iters, final_row, want_out=False):
    """ds from the upstream gradient ``g`` on the normalized matrix.

    out = diag(a)·A·diag(b) with A = softmax(s); the direct contributions
    are dA = a⊙g⊙bᵀ, da = (A⊙g)·b, db = (A⊙g)ᵀ·a, and the softmax-vjp row
    term of the direct dA comes free: rowsum(dA⊙A) = a ⊙ da. The Sinkhorn
    chain is then reversed by the shared lean chain.

    ``want_out=True`` additionally returns the rebuilt normalized matrix
    a⊙A⊙b (one extra elementwise pass — the talking-heads kernel needs the
    pre-post-mix weights for the post-mix parameter gradient)."""
    kb, p, _ = s.shape
    needs_mask = n != p
    lse = vecs[:, vecs.shape[1] - 1][:, :, None]
    if needs_mask:
        col2 = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
        row2 = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
        mask2 = ((row2 < n) & (col2 < n))[None]
        attn = jnp.where(mask2, jnp.exp(s - lse), 0.0)
    else:
        attn = jnp.exp(s - lse)
    as_r, bs_r, nb2_rows, a_cols = _restore_vec_rows(
        attn, vecs, iters=iters, final_row=final_row,
        recip=_recip_fn(needs_mask),
    )
    a_fin = a_cols[-1] if a_cols is not None else as_r[-1].reshape(kb, p, 1)
    b_fin = bs_r[-1]  # row [K, 1, p]
    gf = g.astype(jnp.float32)
    pm = attn * gf
    da = jnp.sum(pm * b_fin, axis=-1, keepdims=True)       # [K, p, 1]
    db_row = jnp.sum(pm * a_fin, axis=-2, keepdims=True)   # [K, 1, p]
    dA = (a_fin * gf) * b_fin
    row_direct = a_fin * da
    inner = _reverse_chain_inner(
        attn, dA, da, db_row, row_direct,
        as_r=as_r, bs_r=bs_r, nb2_rows=nb2_rows,
        iters=iters, final_row=final_row, a_cols=a_cols,
    )
    ds = attn * inner
    if want_out:
        return ds, a_fin * attn * b_fin
    return ds


def _fwd_kernel(s_ref, *out_refs, n, p, iters, final_row, want_vecs,
                vec_rows):
    o_ref = out_refs[0]
    s = s_ref[...].astype(jnp.float32)
    if p != n:
        s = jnp.pad(s, ((0, 0), (0, p - n), (0, p - n)))
    res = _norm_fwd_math(s, n=n, iters=iters, final_row=final_row,
                         want_vecs=want_vecs)
    if want_vecs:
        out, vecs = res
        vecs = jnp.pad(vecs, ((0, 0), (0, vec_rows - vecs.shape[1]), (0, 0)))
        out_refs[1][...] = vecs
    else:
        out = res
    o_ref[...] = out[:, :n, :n].astype(o_ref.dtype)


def _bwd_kernel(s_ref, g_ref, vec_ref, ds_ref, *, n, p, iters, final_row,
                n_vecs):
    pad = ((0, 0), (0, p - n), (0, p - n))
    s = s_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    if p != n:
        s = jnp.pad(s, pad)
        g = jnp.pad(g, pad)
    vecs = vec_ref[...][:, :n_vecs]
    ds = _norm_bwd_math(s, g, vecs, n=n, iters=iters, final_row=final_row)
    ds_ref[...] = ds[:, :n, :n].astype(ds_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("iters", "final_row", "interpret", "want_vecs")
)
def _sinkhorn_softmax_fwd_impl(logits, iters, final_row, interpret,
                               want_vecs=False):
    *batch, n, _ = logits.shape
    r = 1
    for b in batch:
        r *= b
    s = logits.reshape(r, n, n)
    p = _round_up(n, 8)
    g = _pick_g(r, p, bufs=4)
    vec_rows = _vec_rows(iters, final_row, True)
    kernel = functools.partial(
        _fwd_kernel, n=n, p=p, iters=iters, final_row=final_row,
        want_vecs=want_vecs, vec_rows=vec_rows,
    )
    spec_s = pl.BlockSpec((g, n, n), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = spec_s
    out_shape = jax.ShapeDtypeStruct((r, n, n), logits.dtype)
    if want_vecs:
        out_specs = (out_specs, pl.BlockSpec(
            (g, vec_rows, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((r, vec_rows, p), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(r // g,),
        in_specs=[spec_s],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=r * p * p * (4 + 4 * iters),
            bytes_accessed=2 * r * n * n * logits.dtype.itemsize,
            transcendentals=r * p * p,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(s)
    out, vecs = res if want_vecs else (res, None)
    out = out.reshape(*batch, n, n)
    return (out, vecs) if want_vecs else out


@functools.partial(
    jax.jit, static_argnames=("iters", "final_row", "interpret")
)
def _sinkhorn_softmax_bwd_impl(logits, g, vecs, iters, final_row, interpret):
    *batch, n, _ = logits.shape
    r = vecs.shape[0]
    s = logits.reshape(r, n, n)
    gm = g.reshape(r, n, n)
    p = _round_up(n, 8)
    gb = _pick_g(r, p, bufs=6)
    kernel = functools.partial(
        _bwd_kernel, n=n, p=p, iters=iters, final_row=final_row,
        n_vecs=_num_vecs(iters, final_row, True),
    )
    spec_s = pl.BlockSpec((gb, n, n), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vecs = pl.BlockSpec((gb, vecs.shape[1], p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    ds = pl.pallas_call(
        kernel,
        grid=(r // gb,),
        in_specs=[spec_s, spec_s, spec_vecs],
        out_specs=spec_s,
        out_shape=jax.ShapeDtypeStruct((r, n, n), logits.dtype),
        cost_estimate=pl.CostEstimate(
            flops=r * p * p * (8 + 4 * iters),
            bytes_accessed=3 * r * n * n * logits.dtype.itemsize,
            transcendentals=r * p * p,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(s, gm, vecs)
    return ds.reshape(*batch, n, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def sinkhorn_softmax(logits, num_iters=3, final_row_norm=True,
                     interpret=False):
    """Doubly-stochastic attention weights from logits, fused in one kernel:
    ``sinkhorn_normalize(softmax(logits), num_iters, final_row_norm)``
    (ref utils.py:1025-1037 semantics). ``logits [..., N, N]`` square;
    differentiable; output dtype = input dtype (math in f32)."""
    return _sinkhorn_softmax_fwd_impl(
        logits, num_iters, final_row_norm, interpret, want_vecs=False
    )


def _sinkhorn_softmax_fwd(logits, num_iters, final_row_norm, interpret):
    out, vecs = _sinkhorn_softmax_fwd_impl(
        logits, num_iters, final_row_norm, interpret, want_vecs=True
    )
    return out, (logits, vecs)


def _sinkhorn_softmax_bwd(num_iters, final_row_norm, interpret, res, g):
    logits, vecs = res
    return (_sinkhorn_softmax_bwd_impl(
        logits, g, vecs, num_iters, final_row_norm, interpret
    ),)


sinkhorn_softmax.defvjp(_sinkhorn_softmax_fwd, _sinkhorn_softmax_bwd)


# ---------------------------------------------------------------------------
# Rectangular (cross-attention) variant — round 4 (VERDICT-r3 #2b).
#
# CvT attends queries [R] against stride-reduced keys [C = R/4]
# (ref cvt.py:70-102), and Twins' GlobalAttention against k×k-subsampled
# keys (ref twins_svt.py:122-153) — every robust matrix in those models is
# RECTANGULAR, so they always paid the XLA vector form. The math is the same
# scaling-vector chain with a [R]-sized row-scaling stack and a [C]-sized
# column stack; the first row normalization is still the identity
# (rowsum(softmax) ≡ 1 holds for any width). Residuals ship as TWO stacks
# (a-rows + lse at lane width pr, b-rows at lane width pc). The reverse
# chain is the shared lean chain — its vectors already live in the correct
# row/column spaces; only the square-only reshape was generalized.
# ---------------------------------------------------------------------------


def _rect_fwd_math(s, *, nr, nc, iters, final_row, want_vecs):
    """softmax + Sinkhorn chain on padded rectangular logits ``s [K, pr, pc]``
    (f32; rows < nr and cols < nc live). Returns the normalized matrix and,
    with ``want_vecs``, the two residual stacks."""
    kb, pr, pc = s.shape
    mask_cols = nc != pc
    mask_rows = nr != pr
    if mask_cols:
        col2 = jax.lax.broadcasted_iota(jnp.int32, (pr, pc), 1)
        s = jnp.where(col2[None] < nc, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = jnp.sum(e, axis=-1, keepdims=True)
    lse_row = (m + jnp.log(r)).reshape(kb, 1, pr) if want_vecs else None
    inv_r = 1.0 / r
    if mask_rows:
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (pr, 1), 0) < nr)[None]
        inv_r = jnp.where(rowmask, inv_r, 0.0)
    _recip = _recip_fn(mask_rows or mask_cols)
    a_rows, b_rows = [], []
    a_scale = inv_r
    b = jnp.ones((kb, 1, pc), jnp.float32)
    for i in range(iters):
        if i > 0:  # i == 0: rowsum(softmax) ≡ 1 (value and gradient)
            a = _recip(jnp.sum(e * b, axis=-1, keepdims=True) * inv_r)
            a_rows.append(a.reshape(kb, 1, pr))
            a_scale = a * inv_r
        b = _recip(jnp.sum(e * a_scale, axis=-2, keepdims=True))
        b_rows.append(b)
    if final_row:
        a = _recip(jnp.sum(e * b, axis=-1, keepdims=True) * inv_r)
        a_rows.append(a.reshape(kb, 1, pr))
        a_scale = a * inv_r
    out = e * a_scale * b
    if want_vecs:
        return (out, jnp.concatenate(a_rows + [lse_row], axis=1),
                jnp.concatenate(b_rows, axis=1))
    return out


def _rect_bwd_math(s, g, vecs_a, vecs_b, *, nr, nc, iters, final_row):
    """ds [K, pr, pc] from the upstream gradient on the normalized matrix."""
    kb, pr, pc = s.shape
    ka = max(iters - 1, 0) + int(final_row)
    lse = vecs_a[:, ka][:, :, None]  # [K, pr, 1]
    col2 = jax.lax.broadcasted_iota(jnp.int32, (pr, pc), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (pr, pc), 0)
    mask2 = ((row2 < nr) & (col2 < nc))[None]
    attn = jnp.where(mask2, jnp.exp(s - lse), 0.0)
    ones_r = jnp.ones((kb, 1, pr), jnp.float32)
    ones_c = jnp.ones((kb, 1, pc), jnp.float32)
    as_r = [ones_r] + [vecs_a[:, j][:, None, :] for j in range(ka)]
    bs_r = [ones_c] + [vecs_b[:, j][:, None, :] for j in range(iters)]
    nb2 = -(vecs_b * vecs_b)
    nb2_rows = [nb2[:, j][:, None, :] for j in range(iters)]
    a_fin = as_r[-1].reshape(kb, pr, 1)
    b_fin = bs_r[-1]  # [K, 1, pc]
    gf = g.astype(jnp.float32)
    pm = attn * gf
    da = jnp.sum(pm * b_fin, axis=-1, keepdims=True)       # [K, pr, 1]
    db_row = jnp.sum(pm * a_fin, axis=-2, keepdims=True)   # [K, 1, pc]
    dA = (a_fin * gf) * b_fin
    row_direct = a_fin * da
    inner = _reverse_chain_inner(
        attn, dA, da, db_row, row_direct,
        as_r=as_r, bs_r=bs_r, nb2_rows=nb2_rows,
        iters=iters, final_row=final_row, a_cols=None,
    )
    return attn * inner


def _rect_fwd_kernel(s_ref, *out_refs, nr, nc, pr, pc, iters, final_row,
                     want_vecs):
    o_ref = out_refs[0]
    s = s_ref[...].astype(jnp.float32)
    if (pr, pc) != (nr, nc):
        s = jnp.pad(s, ((0, 0), (0, pr - nr), (0, pc - nc)))
    res = _rect_fwd_math(s, nr=nr, nc=nc, iters=iters, final_row=final_row,
                         want_vecs=want_vecs)
    if want_vecs:
        out, va, vb = res
        out_refs[1][...] = va
        out_refs[2][...] = vb
    else:
        out = res
    o_ref[...] = out[:, :nr, :nc].astype(o_ref.dtype)


def _rect_bwd_kernel(s_ref, g_ref, va_ref, vb_ref, ds_ref, *, nr, nc, pr, pc,
                     iters, final_row):
    pad = ((0, 0), (0, pr - nr), (0, pc - nc))
    s = s_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    if (pr, pc) != (nr, nc):
        s = jnp.pad(s, pad)
        g = jnp.pad(g, pad)
    ds = _rect_bwd_math(s, g, va_ref[...], vb_ref[...],
                        nr=nr, nc=nc, iters=iters, final_row=final_row)
    ds_ref[...] = ds[:, :nr, :nc].astype(ds_ref.dtype)


def _rect_per_item_bytes(pr: int, pc: int, bufs: int) -> int:
    """Physical scoped-VMEM bytes one batched chain item costs: the lane
    (minor) dim pads to a full 128-lane tile, and Mosaic holds ~2× the
    logical buffer count live across the chain (calibrated on a real-TPU
    compile of the Twins s2 BWD shape [g=16, 784, 16]: 75.13M scoped = 11.7
    physical 784×128 f32 buffers against the logical bufs=6 model — the
    un-padded model under-counted 8× and OOMed the 40M limit).

    The 2× live-buffer multiplier was measured on the BWD kernel (bufs=6);
    the FWD kernel (bufs=4) reuses it as a conservative extrapolation — its
    true live count was not measured separately. tools/tpu_kernel_check.py
    covers a wide-nc FWD shape at the shipping schedule so a fwd-specific
    under-count would surface as a compile-time scoped-VMEM OOM there, not
    in a model run."""
    pcp = _round_up(pc, 128)
    return 2 * bufs * pr * pcp * 4 + 16 * (pr + pcp) * 4


def _pick_g_rect(r: int, pr: int, pc: int, bufs: int) -> int:
    """Largest divisor of ``r`` meeting BOTH bounds: the logical per-item
    model under the throughput-tuned budget (as the square kernel), and the
    physical lane-padded footprint under the Mosaic scoped hard limit
    (compile safety — see _rect_per_item_bytes)."""
    logical = bufs * pr * pc * 4 + 16 * (pr + pc) * 4
    physical = _rect_per_item_bytes(pr, pc, bufs)
    limit = int(0.9 * int(_os.environ.get(
        "NRV_KERNEL_VMEM_LIMIT", 40 * 1024 * 1024)))
    for g in (16, 12, 8, 6, 4, 3, 2, 1):
        if r % g:
            continue
        if g * logical <= _VMEM_BUDGET and g * physical <= limit:
            return g
    return 1


@functools.partial(
    jax.jit, static_argnames=("iters", "final_row", "interpret", "want_vecs")
)
def _rect_fwd_impl(logits, iters, final_row, interpret, want_vecs=False):
    *batch, nr, nc = logits.shape
    r = 1
    for b in batch:
        r *= b
    s = logits.reshape(r, nr, nc)
    pr, pc = _round_up(nr, 8), _round_up(nc, 8)
    g = _pick_g_rect(r, pr, pc, bufs=4)
    ka = max(iters - 1, 0) + int(final_row)
    kernel = functools.partial(
        _rect_fwd_kernel, nr=nr, nc=nc, pr=pr, pc=pc, iters=iters,
        final_row=final_row, want_vecs=want_vecs,
    )
    spec_s = pl.BlockSpec((g, nr, nc), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = spec_s
    out_shape = jax.ShapeDtypeStruct((r, nr, nc), logits.dtype)
    if want_vecs:
        out_specs = (
            out_specs,
            pl.BlockSpec((g, ka + 1, pr), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, iters, pc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((r, ka + 1, pr), jnp.float32),
            jax.ShapeDtypeStruct((r, iters, pc), jnp.float32),
        )
    res = pl.pallas_call(
        kernel,
        grid=(r // g,),
        in_specs=[spec_s],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=r * pr * pc * (4 + 4 * iters),
            bytes_accessed=2 * r * nr * nc * logits.dtype.itemsize,
            transcendentals=r * pr * pc,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(s)
    if want_vecs:
        out, va, vb = res
        return out.reshape(*batch, nr, nc), va, vb
    return res.reshape(*batch, nr, nc)


@functools.partial(
    jax.jit, static_argnames=("iters", "final_row", "interpret")
)
def _rect_bwd_impl(logits, g, va, vb, iters, final_row, interpret):
    *batch, nr, nc = logits.shape
    r = va.shape[0]
    s = logits.reshape(r, nr, nc)
    gm = g.reshape(r, nr, nc)
    pr, pc = _round_up(nr, 8), _round_up(nc, 8)
    gb = _pick_g_rect(r, pr, pc, bufs=6)
    kernel = functools.partial(
        _rect_bwd_kernel, nr=nr, nc=nc, pr=pr, pc=pc, iters=iters,
        final_row=final_row,
    )
    spec_s = pl.BlockSpec((gb, nr, nc), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_va = pl.BlockSpec((gb, va.shape[1], pr), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_vb = pl.BlockSpec((gb, vb.shape[1], pc), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    ds = pl.pallas_call(
        kernel,
        grid=(r // gb,),
        in_specs=[spec_s, spec_s, spec_va, spec_vb],
        out_specs=spec_s,
        out_shape=jax.ShapeDtypeStruct((r, nr, nc), logits.dtype),
        cost_estimate=pl.CostEstimate(
            flops=r * pr * pc * (8 + 4 * iters),
            bytes_accessed=3 * r * nr * nc * logits.dtype.itemsize,
            transcendentals=r * pr * pc,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(s, gm, va, vb)
    return ds.reshape(*batch, nr, nc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def sinkhorn_softmax_rect(logits, num_iters=3, final_row_norm=True,
                          interpret=False):
    """Rectangular ``sinkhorn_normalize(softmax(logits))`` fused in one
    kernel (ref utils.py:1025-1037 semantics on a [..., R, C] matrix —
    CvT/Twins cross-shaped attention). Differentiable; math in f32."""
    return _rect_fwd_impl(logits, num_iters, final_row_norm, interpret,
                          want_vecs=False)


def _rect_vjp_fwd(logits, num_iters, final_row_norm, interpret):
    out, va, vb = _rect_fwd_impl(logits, num_iters, final_row_norm,
                                 interpret, want_vecs=True)
    return out, (logits, va, vb)


def _rect_vjp_bwd(num_iters, final_row_norm, interpret, res, g):
    logits, va, vb = res
    return (_rect_bwd_impl(logits, g, va, vb, num_iters, final_row_norm,
                           interpret),)


sinkhorn_softmax_rect.defvjp(_rect_vjp_fwd, _rect_vjp_bwd)


def sinkhorn_softmax_rect_supported(shape, num_iters: int) -> bool:
    """Shape gate for the rectangular kernel: one g=1 chain item's PHYSICAL
    scoped-VMEM footprint (lane dim padded to 128, ~12 live buffers in the
    bwd — see _rect_per_item_bytes) must fit under the Mosaic scoped limit.
    Square shapes route to the square kernel (one residual stack, larger
    batching headroom)."""
    if len(shape) < 2 or num_iters < 1:
        return False
    nr, nc = shape[-2], shape[-1]
    if nr == nc or nr < 2 or nc < 2:
        return False
    pr = _round_up(nr, 8)
    limit = int(_os.environ.get("NRV_KERNEL_VMEM_LIMIT", 40 * 1024 * 1024))
    return _rect_per_item_bytes(pr, nc, bufs=6) <= int(0.9 * limit)


def sinkhorn_softmax_supported(shape, num_iters: int) -> bool:
    """Shape gate (caller falls back to the XLA vector form): square
    self-attention matrices whose padded chain scratch fits VMEM."""
    if len(shape) < 2 or shape[-1] != shape[-2]:
        return False
    if num_iters < 1:
        return False
    n = shape[-1]
    if n < 2 or _round_up(n, 8) > _MAX_P:
        return False
    r = 1
    for b in shape[:-2]:
        r *= b
    return r >= 1
