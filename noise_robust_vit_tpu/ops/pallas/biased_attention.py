"""Fused biased (windowed) attention kernel — the robust fast path for the
hierarchical models.

The windowed/hierarchical models add a per-(window, head) additive logit
bias before the softmax: Swin's relative-position bias + shift mask
(ref swin.py:186-237), LeViT's attention-bias tables (ref levit.py:225-238),
MaxViT's rel-pos-biased block/grid attention (ref max_vit.py:121-203). The
round-1 per-window fused kernel lost to XLA's batched GEMMs (RESULTS.md:
per-window grid programs serialize tiny matrices); this kernel instead
K-batches MANY (window, head) items per program — the round-2 chain-batching
recipe (`sinkhorn_attention._fwd_math_batched`) — with the bias as ONE extra
operand whose block is cached in VMEM across the batch dimension of the grid.

Layout contract (exactly what the window models already compute):

  * q, k:   ``[BW, H, N, D]``  (BW = batch · num_windows)
  * v:      ``[BW, H, N, DV]`` (LeViT's attn_ratio makes DV ≠ D)
  * bias:   ``[nW, H, N, N]``  — additive, f32, broadcast over the
            ``BW // nW`` batch images (window w of image b reads bias row
            ``bw % nW``); pass ``nW = 1`` for a pure per-head bias (LeViT).
  * out:    ``[BW, H, N, DV]``; fully differentiable in q, k, v AND bias
            (dbias accumulates across the batch inside the kernel grid).

Grid = (bias-cycle positions, batch cycles) with the batch cycle innermost:
the bias input block is constant across the inner axis (Pallas skips the
re-DMA), and the dbias output block is revisited consecutively so it
accumulates in VMEM (TPU grids run sequentially).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_attention import _compiler_params, _num_vecs, _vec_rows
from .sinkhorn_attention import (
    _bwd_math_batched,
    _fwd_math_batched,
    _round_up,
    _MAX_N_PAD,
)

__all__ = ["biased_attention", "biased_attention_supported"]

_LANE = 128
import os as _os

_VMEM_BUDGET = int(_os.environ.get("NRV_KERNEL_VMEM_BUDGET", 17.5 * 1024 * 1024))
# Mosaic's actual scoped-stack demand for the 8-aligned (non-128-lane)
# layouts exceeds the _pick_groups byte model by ~2.5× (measured OOM at
# 43.8M with a 17.5M budget), so this kernel carries its own higher
# ceiling — v5e VMEM is 128MB, plenty for the double-buffered IO blocks.
_BIASED_VMEM_LIMIT = int(
    _os.environ.get("NRV_BIASED_VMEM_LIMIT", 64 * 1024 * 1024)
)


def _biased_compiler_params():
    if _BIASED_VMEM_LIMIT:
        return pltpu.CompilerParams(vmem_limit_bytes=_BIASED_VMEM_LIMIT)
    return _compiler_params()


def _pad_n(n: int) -> int:
    """Padded size of the window-token dim. Windowed N (49, 16, …) is far
    below the 128-lane tile, so lane padding makes every N² pass run mostly
    on padding ((128/49)² ≈ 6.8× the useful elements). Default: pad to the
    8-sublane tile only — the attention matrix becomes
    [K, ⌈N/8⌉·8, ⌈N/8⌉·8] (non-128 lane widths are legal for values and for
    blocks that span the array), trading denser VPU passes against Mosaic's
    preference for 128-aligned MXU operands. Round-1 measured that trade as
    a LOSS at N=196; windowed N is the opposite regime — measured v5e bs128:
    swin_t robust 590.6 → 867.5 img/s, LeViT_128S robust 6247 → 8487
    (bs256). NRV_BIASED_PAD128=1 restores lane padding."""
    if _os.environ.get("NRV_BIASED_PAD128"):
        return _round_up(n, _LANE)
    return _round_up(n, 8)


def _pick_groups(bw: int, heads: int, n_pad: int, dmax: int, nw: int,
                 robust: bool, bwd: bool) -> int:
    """Batch-group width gb: all heads ride in one block (heads are small in
    the windowed models), so pick the largest gb with (a) gb | BW,
    (b) gb | nW or nW | gb (the bias block must tile the window cycle), and
    (c) the batched chain scratch within the VMEM budget."""
    nn_bufs = (5 if robust else 4) if bwd else (3 if robust else 2)
    per_item = nn_bufs * n_pad * n_pad * 4 + 10 * n_pad * dmax * 4
    best = 1
    for gb in (32, 16, 8, 4, 2, 1):
        if bw % gb or (nw % gb and gb % nw):
            continue
        if gb * heads * per_item <= _VMEM_BUDGET:
            best = gb
            break
    return best


def _fwd_kernel(q_ref, k_ref, v_ref, *rest, scale, n, n_pad, robust,
                iters, final_row, gb, heads, want_vecs, vec_rows,
                has_bias=True):
    if has_bias:
        b_ref, *out_refs = rest
    else:
        b_ref, out_refs = None, rest
    o_ref = out_refs[0]
    vec_ref = out_refs[1] if want_vecs else None
    kk = gb * heads
    d = q_ref.shape[-1]
    dv = v_ref.shape[-1]
    pad = ((0, 0), (0, n_pad - n), (0, 0))
    q = jnp.pad(q_ref[...].reshape(kk, n, d), pad)
    k = jnp.pad(k_ref[...].reshape(kk, n, d), pad)
    v = jnp.pad(v_ref[...].reshape(kk, n, dv), pad)
    bias = b_ref[...].reshape(kk, n_pad, n_pad) if has_bias else None
    res = _fwd_math_batched(
        q, k, v, scale=scale, n=n, robust=robust, iters=iters,
        final_row=final_row, want_vecs=want_vecs, bias=bias,
    )
    if want_vecs:
        out, vecs = res
        vecs = jnp.pad(vecs, ((0, 0), (0, vec_rows - vecs.shape[1]), (0, 0)))
        vec_ref[...] = vecs.reshape(gb, heads, vec_rows, n_pad)
    else:
        out = res
    o_ref[...] = out[:, :n].reshape(gb, heads, n, dv).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, vec_ref, *rest, scale, n, n_pad,
                robust, iters, final_row, gb, heads, n_vecs, has_bias=True):
    if has_bias:
        b_ref = rest[0]
        dq_ref, dk_ref, dv_ref, db_ref = rest[1:]
    else:
        b_ref = db_ref = None
        dq_ref, dk_ref, dv_ref = rest
    kk = gb * heads
    d = q_ref.shape[-1]
    dv_dim = v_ref.shape[-1]
    pad = ((0, 0), (0, n_pad - n), (0, 0))
    q = jnp.pad(q_ref[...].reshape(kk, n, d), pad)
    k = jnp.pad(k_ref[...].reshape(kk, n, d), pad)
    v = jnp.pad(v_ref[...].reshape(kk, n, dv_dim), pad)
    g = jnp.pad(g_ref[...].reshape(kk, n, dv_dim), pad)
    vecs = vec_ref[...].reshape(kk, -1, n_pad)[:, :n_vecs]
    bias = b_ref[...].reshape(kk, n_pad, n_pad) if has_bias else None
    res = _bwd_math_batched(
        q, k, v, g, scale=scale, n=n, robust=robust, iters=iters,
        final_row=final_row, vecs=vecs, bias=bias, want_ds=has_bias,
    )
    dq, dk, dv = res[:3]
    dq_ref[...] = dq[:, :n].reshape(gb, heads, n, d).astype(dq_ref.dtype)
    dk_ref[...] = dk[:, :n].reshape(gb, heads, n, d).astype(dk_ref.dtype)
    dv_ref[...] = dv[:, :n].reshape(gb, heads, n, dv_dim).astype(dv_ref.dtype)
    if not has_bias:
        return
    ds_b = res[3].reshape(gb, heads, n_pad, n_pad)

    # dbias accumulates over the batch-cycle grid axis (innermost → the
    # output block stays resident in VMEM across revisits)
    @pl.when(pl.program_id(1) == 0)
    def _init():
        db_ref[...] = ds_b

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        db_ref[...] = db_ref[...] + ds_b


def _prep_bias(bias, nw, heads, n, n_pad, gb):
    """Pad the [nW, H, N, N] bias to lane tiles and tile the window axis to
    L = lcm(nW, gb) so a gb-wide batch block always reads a contiguous bias
    block; returns (bias_L [L, H, n_pad, n_pad] f32, L)."""
    L = gb * nw // math.gcd(gb, nw)
    b = bias.astype(jnp.float32)
    if n_pad != n:
        b = jnp.pad(b, ((0, 0), (0, 0), (0, n_pad - n), (0, n_pad - n)))
    if L != nw:
        b = jnp.tile(b, (L // nw, 1, 1, 1))
    return b, L


@functools.partial(
    jax.jit,
    static_argnames=("scale", "robust", "iters", "final_row", "nw",
                     "interpret", "want_vecs", "no_bias"),
)
def _biased_fwd_impl(q, k, v, bias, scale, robust, iters, final_row, nw,
                     interpret=False, want_vecs=False, no_bias=False):
    bw, heads, n, d = q.shape
    dv = v.shape[-1]
    n_pad = _pad_n(n)
    gb = _pick_groups(bw, heads, n_pad, max(d, dv), 1 if no_bias else nw,
                      robust, bwd=False)
    if no_bias:
        bias_L, L = None, gb  # no bias operand: trivial window cycle
    else:
        bias_L, L = _prep_bias(bias, nw, heads, n, n_pad, gb)
    vec_rows = _vec_rows(iters, final_row, robust)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, n=n, n_pad=n_pad, robust=robust,
        iters=iters, final_row=final_row, gb=gb, heads=heads,
        want_vecs=want_vecs, vec_rows=vec_rows, has_bias=not no_bias,
    )
    pos, cycles = L // gb, bw // L
    spec_q = pl.BlockSpec((gb, heads, n, d),
                          lambda p, c, np_=pos: (c * np_ + p, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((gb, heads, n, dv),
                          lambda p, c, np_=pos: (c * np_ + p, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((gb, heads, n_pad, n_pad),
                          lambda p, c: (p, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = spec_v
    out_shape = jax.ShapeDtypeStruct((bw, heads, n, dv), v.dtype)
    if want_vecs:
        out_specs = (out_specs, pl.BlockSpec(
            (gb, heads, vec_rows, n_pad),
            lambda p, c, np_=pos: (c * np_ + p, 0, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (bw, heads, vec_rows, n_pad), jnp.float32))
    in_specs = [spec_q, spec_q, spec_v] + ([] if no_bias else [spec_b])
    operands = (q, k, v) if no_bias else (q, k, v, bias_L)
    res = pl.pallas_call(
        kernel,
        grid=(pos, cycles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=bw * heads * 2 * n_pad * n_pad * (d + dv),
            bytes_accessed=(q.size * 2 + v.size * 2) * q.dtype.itemsize,
            transcendentals=bw * heads * n_pad * n_pad,
        ),
        interpret=interpret,
        compiler_params=_biased_compiler_params(),
    )(*operands)
    return res if want_vecs else (res, None)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "robust", "iters", "final_row", "nw",
                     "interpret", "no_bias"),
)
def _biased_bwd_impl(q, k, v, bias, g, vecs, scale, robust, iters, final_row,
                     nw, interpret=False, no_bias=False):
    bw, heads, n, d = q.shape
    dv = v.shape[-1]
    n_pad = _pad_n(n)
    gb = _pick_groups(bw, heads, n_pad, max(d, dv), 1 if no_bias else nw,
                      robust, bwd=True)
    if no_bias:
        bias_L, L = None, gb
    else:
        bias_L, L = _prep_bias(bias, nw, heads, n, n_pad, gb)
    vec_rows = vecs.shape[2]
    kernel = functools.partial(
        _bwd_kernel, scale=scale, n=n, n_pad=n_pad, robust=robust,
        iters=iters, final_row=final_row, gb=gb, heads=heads,
        n_vecs=_num_vecs(iters, final_row, robust), has_bias=not no_bias,
    )
    pos, cycles = L // gb, bw // L
    spec_q = pl.BlockSpec((gb, heads, n, d),
                          lambda p, c, np_=pos: (c * np_ + p, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((gb, heads, n, dv),
                          lambda p, c, np_=pos: (c * np_ + p, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vecs = pl.BlockSpec((gb, heads, vec_rows, n_pad),
                             lambda p, c, np_=pos: (c * np_ + p, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((gb, heads, n_pad, n_pad),
                          lambda p, c: (p, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [spec_q, spec_q, spec_v, spec_v, spec_vecs]
    out_specs = [spec_q, spec_q, spec_v]
    out_shape = [
        jax.ShapeDtypeStruct((bw, heads, n, d), q.dtype),
        jax.ShapeDtypeStruct((bw, heads, n, d), k.dtype),
        jax.ShapeDtypeStruct((bw, heads, n, dv), v.dtype),
    ]
    operands = [q, k, v, g, vecs]
    if not no_bias:
        in_specs.append(spec_b)
        out_specs.append(spec_b)
        out_shape.append(
            jax.ShapeDtypeStruct((L, heads, n_pad, n_pad), jnp.float32))
        operands.append(bias_L)
    res = pl.pallas_call(
        kernel,
        grid=(pos, cycles),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=bw * heads * 6 * n_pad * n_pad * (d + dv),
            bytes_accessed=(q.size * 4 + v.size * 4) * q.dtype.itemsize,
            transcendentals=bw * heads * n_pad * n_pad,
        ),
        interpret=interpret,
        compiler_params=_biased_compiler_params(),
    )(*operands)
    dq, dk, dv_out = res[:3]
    if no_bias:
        # known-zero bias (e.g. Twins local attention): the kernel never
        # touched it, so its cotangent is exactly zero — no VPU/HBM spend
        return dq, dk, dv_out, jnp.zeros(bias.shape, bias.dtype)
    dbias_L = res[3]
    # fold the tiled window copies back and unpad
    if L != nw:
        dbias_L = dbias_L.reshape(L // nw, nw, heads, n_pad, n_pad).sum(0)
    dbias = dbias_L[:, :, :n, :n].astype(bias.dtype)
    return dq, dk, dv_out, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def biased_attention(q, k, v, bias, scale, robust=False, sinkhorn_iters=3,
                     final_row_norm=True, num_windows=1, interpret=False,
                     no_bias=False):
    """Fused attention with an additive per-(window, head) logit bias.

    ``q/k [BW, H, N, D]``, ``v [BW, H, N, DV]``, ``bias [nW, H, N, N]``
    (f32, broadcast over the batch — window ``bw % nW`` of each image).
    ``robust=True`` applies softmax + Sinkhorn renormalization
    (ref utils.py:1025-1037, swin.py:239-244). Differentiable in all four
    tensor arguments.

    ``no_bias=True`` (static) declares the bias known-zero: the kernels skip
    the bias operand, the bias add, the dbias accumulation and the host-side
    window fold, and the vjp returns exact zeros — the path Twins' local
    attention uses (it needs the fused kernel for VMEM residency, not for a
    bias)."""
    out, _ = _biased_fwd_impl(q, k, v, bias, scale, robust, sinkhorn_iters,
                              final_row_norm, num_windows, interpret,
                              want_vecs=False, no_bias=no_bias)
    return out


def _biased_attention_fwd(q, k, v, bias, scale, robust, sinkhorn_iters,
                          final_row_norm, num_windows, interpret, no_bias):
    out, vecs = _biased_fwd_impl(q, k, v, bias, scale, robust, sinkhorn_iters,
                                 final_row_norm, num_windows, interpret,
                                 want_vecs=True, no_bias=no_bias)
    return out, (q, k, v, bias, vecs)


def _biased_attention_bwd(scale, robust, sinkhorn_iters, final_row_norm,
                          num_windows, interpret, no_bias, res, g):
    q, k, v, bias, vecs = res
    return _biased_bwd_impl(q, k, v, bias, g, vecs, scale, robust,
                            sinkhorn_iters, final_row_norm, num_windows,
                            interpret, no_bias=no_bias)


biased_attention.defvjp(_biased_attention_fwd, _biased_attention_bwd)


def biased_attention_supported(bw: int, heads: int, n: int, d: int, dv: int,
                               nw: int) -> bool:
    """Shape gate (caller falls back to the XLA path)."""
    if bw % nw:
        return False
    if _round_up(n, _LANE) > _MAX_N_PAD:
        return False
    if d % 8 or dv % 8:
        return False
    # a valid batch group always exists: gb=1 divides every BW and every nW
    # divides into cycles of 1, so _pick_groups can always fall back to
    # per-(window, head) programs — no further shape gate needed here
    return True
