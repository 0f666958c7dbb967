"""Packed-qkv fused attention kernel — the in-model fast path.

Round-1 finding (CLAUDE.md): the per-(batch·head) fused kernel
(`sinkhorn_attention.py`) wins in isolation but LOSES inside the full model
because its ``[B,H,N,D]`` operands force real transpose/pad copies at the
opaque kernel boundary and block XLA's scheduling. Step-anatomy ablation
(round 2, v5e, ViT-B/16 bs256 bf16, donated step 301.5 ms): attention costs
145 ms in-model — 88 ms for the two tiny-K GEMMs + N² f32 HBM round-trips,
57 ms for the softmax passes.

This kernel removes the boundary entirely:

  * input is the **packed qkv projection output** ``[B, N, 3·H·D]`` exactly
    as ``to_qkv`` produces it (q|k|v chunk order, ref simple_vit.py:66-68);
    the three per-head-group slices are addressed by three BlockSpecs with
    different index maps **over the same operand** — zero host-side
    transposes, pads, splits or copies;
  * output is ``[B, N, H·D]`` exactly as ``to_out`` consumes it;
  * grid is (batch-groups × head-groups); Mosaic requires 128-divisible
    minor block dims, so each block carries ``128 // dim_head`` heads
    side-by-side; each program pads its ``[N, D]`` tiles to MXU-aligned
    shapes **in VMEM**, computes softmax (or Sinkhorn-renormalized,
    ref utils.py:1025-1037) attention, and writes back — the N×N matrix
    never exists in HBM, in either the forward or the hand-derived backward
    (`sinkhorn_attention._bwd_math_batched`);
  * backward consumes the incoming ``[B, N, H·D]`` cotangent directly and
    emits (dq, dk, dv) chunks that XLA concatenates straight into the
    ``to_qkv`` backward GEMMs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sinkhorn_attention import _bwd_math_batched, _fwd_math_batched, _round_up

__all__ = ["packed_attention", "packed_attention_supported"]

_LANE = 128
_MAX_N_PAD = 1536
# scoped-VMEM budget for sizing batch groups (bytes); env-overridable for
# perf experiments (tools/perf_probe.py)
import os as _os

_VMEM_BUDGET = int(_os.environ.get("NRV_KERNEL_VMEM_BUDGET", 17.5 * 1024 * 1024))
# Mosaic's scoped-VMEM ceiling defaults to 16MB and is what actually caps
# the batch width K; raising it per-kernel to 40MB unlocks K=8 groups
# (v5e VMEM is 128MB — plenty of headroom for the double-buffered IO blocks).
# Measured (ViT-B/16 bs256): robust 859.9 → 881.3 img/s, vanilla
# 1244.7 → 1261.6; K=16 plateaus (875-883)
_VMEM_LIMIT = int(_os.environ.get("NRV_KERNEL_VMEM_LIMIT", 40 * 1024 * 1024))


def _compiler_params():
    if _VMEM_LIMIT:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return None
# Sinkhorn scaling-vector residual rows live in a sublane-tiled buffer:
# the row count is _num_vecs rounded up to a multiple of 8 (a full f32
# sublane tile). Skips the backward's forward-replay of the scaling
# iteration — round-1 win, CLAUDE.md "stored-vector bwd".
_SUBLANE = 8


def _num_vecs(iters: int, final_row: bool, robust: bool) -> int:
    """Residual rows: Sinkhorn scaling vectors (robust) + the softmax
    log-normalizer row (always — lets the backward rebuild attn in one
    exp pass instead of replaying max/exp/sum/div)."""
    if not robust:
        return 1
    return max(iters - 1, 0) + int(final_row) + iters + 1


def _vec_rows(iters: int, final_row: bool, robust: bool) -> int:
    """Residual-buffer row count: _num_vecs rounded up to a sublane tile
    (fixed 8 overflowed for iters>=4 with final_row_norm — round-2 advisor
    finding)."""
    return _round_up(_num_vecs(iters, final_row, robust), _SUBLANE)


def _heads_per_block(dim_head: int) -> int:
    """Heads per 128-lane block (Mosaic minor block dims must be
    128-divisible or span the array)."""
    if dim_head >= _LANE:
        return 1
    return _LANE // dim_head


def _block_width(dim_head: int) -> int:
    return _heads_per_block(dim_head) * dim_head


def _pick_batch_group(b: int, per_image_bytes: int, budget: int) -> int:
    """Largest divisor of ``b`` from {16,8,4,2,1} whose unrolled per-image
    scratch fits the VMEM budget (Mosaic keeps each unrolled iteration's
    scratch live separately — no reuse across a python loop)."""
    for g in (16, 8, 4, 2, 1):
        if b % g == 0 and g * per_image_bytes <= budget:
            return g
    return 1


def _fwd_kernel(q_ref, k_ref, v_ref, *out_refs, scale, n, n_pad, d, robust,
                iters, final_row, g, hpb, want_vecs, vec_rows=0):
    o_ref = out_refs[0]
    vec_ref = out_refs[1] if want_vecs else None
    # pad the full (128-lane-aligned) blocks once, THEN slice heads — Mosaic
    # can't pad a value carrying an unaligned lane offset — and stack every
    # (image, head) slice into ONE batched call so the Sinkhorn scaling
    # chain runs once over [g·hpb, N, N] (see _fwd_math_batched)
    qs, ks, vs = [], [], []
    for gi in range(g):
        qb = jnp.pad(q_ref[gi], ((0, n_pad - n), (0, 0)))
        kb = jnp.pad(k_ref[gi], ((0, n_pad - n), (0, 0)))
        vb = jnp.pad(v_ref[gi], ((0, n_pad - n), (0, 0)))
        for hh in range(hpb):
            sl = slice(hh * d, (hh + 1) * d)
            qs.append(qb[:, sl])
            ks.append(kb[:, sl])
            vs.append(vb[:, sl])
    res = _fwd_math_batched(
        jnp.stack(qs), jnp.stack(ks), jnp.stack(vs),
        scale=scale, n=n, robust=robust, iters=iters, final_row=final_row,
        want_vecs=want_vecs,
    )
    if want_vecs:
        out, vecs = res
        k_v = vecs.shape[1]
        vecs = jnp.pad(vecs, ((0, 0), (0, vec_rows - k_v), (0, 0)))
    else:
        out = res
    for gi in range(g):
        outs = [out[gi * hpb + hh] for hh in range(hpb)]
        block = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)
        o_ref[gi] = block[:n].astype(o_ref.dtype)
        if want_vecs:
            for hh in range(hpb):
                vec_ref[gi, hh] = vecs[gi * hpb + hh]


def _bwd_kernel(*refs, scale, n, n_pad, d, robust, iters, final_row, g, hpb,
                has_vecs, n_vecs):
    if has_vecs:
        q_ref, k_ref, v_ref, g_ref, vec_ref, dq_ref, dk_ref, dv_ref = refs
    else:
        q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref = refs
        vec_ref = None
    # stack every (image, head) slice into ONE batched [g·hpb, N, D] call:
    # the robust reverse chain is a sequential string of tiny vector ops, so
    # running it once over the whole block (instead of g·hpb times) keeps
    # the VPU pipeline full
    qs, ks, vs, gs = [], [], [], []
    for gi in range(g):
        qb = jnp.pad(q_ref[gi], ((0, n_pad - n), (0, 0)))
        kb = jnp.pad(k_ref[gi], ((0, n_pad - n), (0, 0)))
        vb = jnp.pad(v_ref[gi], ((0, n_pad - n), (0, 0)))
        gb = jnp.pad(g_ref[gi], ((0, n_pad - n), (0, 0)))
        for hh in range(hpb):
            sl = slice(hh * d, (hh + 1) * d)
            qs.append(qb[:, sl])
            ks.append(kb[:, sl])
            vs.append(vb[:, sl])
            gs.append(gb[:, sl])
    vecs = None
    if vec_ref is not None:
        vecs = jnp.stack([
            vec_ref[gi, hh, :n_vecs]
            for gi in range(g) for hh in range(hpb)
        ])  # [g·hpb, n_vecs, n_pad]
    dq, dk, dv = _bwd_math_batched(
        jnp.stack(qs), jnp.stack(ks), jnp.stack(vs), jnp.stack(gs),
        scale=scale, n=n, robust=robust, iters=iters, final_row=final_row,
        vecs=vecs,
    )
    for gi in range(g):
        idx = slice(gi * hpb, (gi + 1) * hpb)
        cat = (lambda ts: ts[0]) if hpb == 1 else (
            lambda ts: jnp.concatenate(ts, axis=-1)
        )
        dq_ref[gi] = cat([dq[j] for j in range(idx.start, idx.stop)])[:n].astype(dq_ref.dtype)
        dk_ref[gi] = cat([dk[j] for j in range(idx.start, idx.stop)])[:n].astype(dk_ref.dtype)
        dv_ref[gi] = cat([dv[j] for j in range(idx.start, idx.stop)])[:n].astype(dv_ref.dtype)


def _qkv_specs(head_groups: int, width: int, n: int, g: int):
    """Three views over the SAME packed [B, N, 3·H·D] operand: block index
    units on the last axis are ``width``-sized chunks, so the q/k/v slices
    of head-group j live at chunk offsets j, HG+j, 2·HG+j."""
    return [
        pl.BlockSpec((g, n, width), lambda i, j, off=off: (i, 0, off + j),
                     memory_space=pltpu.VMEM)
        for off in (0, head_groups, 2 * head_groups)
    ]


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "scale", "robust", "iters",
                     "final_row", "interpret", "want_vecs"),
)
def _packed_fwd_impl(qkv, heads, dim_head, scale, robust, iters, final_row,
                     interpret=False, want_vecs=False):
    b, n, _ = qkv.shape
    d = dim_head
    hpb = _heads_per_block(d)
    width = _block_width(d)
    head_groups = heads // hpb
    n_pad = _round_up(n, _LANE)
    # per-image unrolled scratch (hpb heads): ~2 N² f32 each + [n_pad, d] tiles
    per_image = hpb * (2 * n_pad * n_pad * 4 + 8 * n_pad * d * 4)
    if robust:
        per_image += hpb * n_pad * n_pad * 4
    g = _pick_batch_group(b, per_image, budget=_VMEM_BUDGET)
    vec_rows = _vec_rows(iters, final_row, robust)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, n=n, n_pad=n_pad, d=d, robust=robust,
        iters=iters, final_row=final_row, g=g, hpb=hpb, want_vecs=want_vecs,
        vec_rows=vec_rows,
    )
    out_specs = pl.BlockSpec((g, n, width), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n, heads * d), qkv.dtype)
    if want_vecs:
        out_specs = (out_specs, pl.BlockSpec(
            (g, hpb, vec_rows, n_pad), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (b, heads, vec_rows, n_pad), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(b // g, head_groups),
        in_specs=_qkv_specs(head_groups, width, n, g),
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=b * heads * 4 * n_pad * n_pad * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + b * n * heads * d * qkv.dtype.itemsize,
            transcendentals=b * heads * n_pad * n_pad,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(qkv, qkv, qkv)
    return res if want_vecs else (res, None)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "scale", "robust", "iters",
                     "final_row", "interpret"),
)
def _packed_bwd_impl(qkv, dout, heads, dim_head, scale, robust, iters,
                     final_row, interpret=False, vecs=None):
    b, n, _ = qkv.shape
    d = dim_head
    hpb = _heads_per_block(d)
    width = _block_width(d)
    head_groups = heads // hpb
    n_pad = _round_up(n, _LANE)
    # hand-derived backward keeps ~4 N² f32 buffers live per image-head
    per_image = hpb * ((5 if robust else 4) * n_pad * n_pad * 4
                       + 12 * n_pad * d * 4)
    g = _pick_batch_group(b, per_image, budget=_VMEM_BUDGET)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, n=n, n_pad=n_pad, d=d, robust=robust,
        iters=iters, final_row=final_row, g=g, hpb=hpb,
        has_vecs=vecs is not None, n_vecs=_num_vecs(iters, final_row, robust),
    )
    spec = pl.BlockSpec((g, n, width), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    in_specs = _qkv_specs(head_groups, width, n, g) + [spec]
    operands = [qkv, qkv, qkv, dout]
    if vecs is not None:
        in_specs.append(pl.BlockSpec(
            (g, hpb, _vec_rows(iters, final_row, robust), n_pad),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(vecs)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b // g, head_groups),
        in_specs=in_specs,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, n, heads * d), qkv.dtype) for _ in range(3)
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * heads * 10 * n_pad * n_pad * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * heads * n_pad * n_pad,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*operands)
    # dqkv in the packed q|k|v chunk layout ``to_qkv`` produced
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def packed_attention(qkv, heads, dim_head, scale, robust=False,
                     sinkhorn_iters=3, final_row_norm=True, interpret=False):
    """Fused multi-head attention over a packed ``[B, N, 3·H·D]`` qkv tensor
    (q|k|v chunk order). Returns ``[B, N, H·D]``. ``robust=True`` applies
    softmax + Sinkhorn renormalization (ref utils.py:1025-1037) instead of
    plain softmax (ref simple_vit.py:64-76)."""
    out, _ = _packed_fwd_impl(qkv, heads, dim_head, scale, robust,
                              sinkhorn_iters, final_row_norm, interpret,
                              want_vecs=False)
    return out


def _packed_attention_fwd(qkv, heads, dim_head, scale, robust, sinkhorn_iters,
                          final_row_norm, interpret):
    out, vecs = _packed_fwd_impl(qkv, heads, dim_head, scale, robust,
                                 sinkhorn_iters, final_row_norm, interpret,
                                 want_vecs=True)
    return out, (qkv, vecs)


def _packed_attention_bwd(heads, dim_head, scale, robust, sinkhorn_iters,
                          final_row_norm, interpret, res, g):
    qkv, vecs = res
    return (_packed_bwd_impl(qkv, g, heads, dim_head, scale, robust,
                             sinkhorn_iters, final_row_norm, interpret,
                             vecs=vecs),)


packed_attention.defvjp(_packed_attention_fwd, _packed_attention_bwd)


def packed_attention_supported(n: int, dim_head: int, heads: int,
                               batch: int) -> bool:
    """Shape gate for the packed kernel (caller falls back to the XLA path):
    head width must tile 128 lanes exactly and heads must fill whole blocks."""
    if dim_head < _LANE and (_LANE % dim_head != 0 or dim_head % 8 != 0):
        return False
    if dim_head >= _LANE and dim_head % _LANE != 0:
        return False
    if heads % _heads_per_block(dim_head) != 0:
        return False
    return _round_up(n, _LANE) <= _MAX_N_PAD and batch >= 1
