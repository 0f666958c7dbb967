"""Fused talking-heads Sinkhorn: pre-mix → softmax+Sinkhorn → post-mix.

CaiT's attention (ref cait.py:110-119) wraps the normalization in two
learned H×H head-mixing contractions:

    dots → einsum('bhij,hg->bgij', ·, mix_pre) → sinkhorn → einsum(post) → @v

The mixes are tiny-K batched GEMMs over the full [B,H,N,N] matrix — pure
HBM bandwidth (arithmetic intensity = H ≈ 8 flops/elem), and they sit on
EITHER side of the `sinkhorn_softmax` kernel boundary, so the robust CaiT
step pays ~17 HBM N² round-trips per layer (2 per mix fwd, ~8 across their
backwards, plus the kernel's own I/O). Round-3 measured the consequence:
CaiT robust ran at 0.69–0.76× vanilla with the logits kernel NEUTRAL there
(RESULTS.md) because the mixes dominate.

This kernel fuses the whole sandwich into ONE VMEM residency per image:

    fwd:  read dots, write mixed weights            (2 HBM passes)
    bwd:  read dots+g+vecs, write ddots (+ 2 H×H)   (3 HBM passes)

In-kernel the mixes are unrolled scalar-scaled plane sums over the H
(outer) dim — the MXU cannot contract an outer dim without a lane/sublane
relayout, and H² VMEM tile passes are far cheaper than the relayout or the
HBM round-trips they replace. The H×H mix parameters ride in SMEM (scalar
reads). The parameter gradients dpre/dpost are per-row batched H×H
dot_generals (contract lanes, batch sublanes — one read of each operand)
accumulated across the sequential grid by output-block revisiting, the
`biased_attention` dbias recipe.

The chain math is shared with `sinkhorn_softmax` (`_norm_fwd_math` /
`_norm_bwd_math`): identical semantics to
``postmix(sinkhorn_attention(premix(dots)))``, ref utils.py:1025-1037 for
the normalization, ref cait.py:110-119 for the mixing order. Square
self-attention matrices only; the CLS cross-attention stage (rows=1) keeps
the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_attention import _num_vecs, _vec_rows
from .sinkhorn_attention import _compiler_params, _round_up
from .sinkhorn_softmax import (
    _MAX_P,
    _VMEM_BUDGET,
    _norm_bwd_math,
    _norm_fwd_math,
)

__all__ = ["talking_heads_sinkhorn", "talking_heads_supported"]


def _mix(x, w_ref, h: int, transpose: bool = False):
    """out_q = Σ_h w[h,q]·x_h over the leading (outer) dim of ``x [h,p,p]``;
    ``transpose`` contracts the other index (out_h = Σ_q w[h,q]·x_q — the
    vjp of the forward mix). Unrolled: h is static and ≤ ~8."""

    def wt(i, j):
        return w_ref[j, i] if transpose else w_ref[i, j]

    outs = []
    for q in range(h):
        acc = x[0] * wt(0, q)
        for i in range(1, h):
            acc = acc + x[i] * wt(i, q)
        outs.append(acc)
    return jnp.stack(outs, axis=0)


def _plane_bilinear(a, b):
    """dW[h,q] = Σ_{i,j} a[h,i,j]·b[q,i,j] as ONE batched dot_general —
    contract lanes (j), batch rows (i) → [p,h,h], then a cheap outer-dim
    reduce. Reads each operand ~twice (transpose + matmul); Mosaic requires
    batch dims at position 0, hence the up-front [h,p,p]→[p,h,p]
    minor-preserving transposes, and the unrolled h² scalar-reduction
    alternative mis-lowers on real TPU (measured err ~1.4 vs 3e-4 — round-4
    probe), so this is the only correct formulation that compiles."""
    at = jnp.transpose(a, (1, 0, 2))
    bt = jnp.transpose(b, (1, 0, 2))
    per_row = jax.lax.dot_general(
        at, bt, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [p, h, h]
    # accuracy note (round-4 f64 probe): this B·N²-term f32 reduction sits at
    # ~3e-3 abs from the f64 truth at CaiT geometry — the same floor class as
    # XLA's own einsum vjp (1.3e-3); a per-[H,H]-entry noise averaged over
    # ~10⁵ activations, gated separately in tools/tpu_kernel_check.py
    return jnp.sum(per_row, axis=0)


def _th_fwd_kernel(s_ref, pre_ref, post_ref, *out_refs, n, p, h, iters,
                   final_row, want_vecs, vec_rows):
    s = s_ref[...].astype(jnp.float32).reshape(h, n, n)
    if p != n:
        s = jnp.pad(s, ((0, 0), (0, p - n), (0, p - n)))
    m = _mix(s, pre_ref, h)
    res = _norm_fwd_math(m, n=n, iters=iters, final_row=final_row,
                         want_vecs=want_vecs)
    if want_vecs:
        out, vecs = res
        vecs = jnp.pad(vecs, ((0, 0), (0, vec_rows - vecs.shape[1]), (0, 0)))
        out_refs[1][...] = vecs.reshape(1, h, vec_rows, p)
    else:
        out = res
    y = _mix(out, post_ref, h)
    out_refs[0][...] = y[:, :n, :n].reshape(1, h, n, n).astype(
        out_refs[0].dtype)


def _th_bwd_kernel(s_ref, g_ref, vec_ref, pre_ref, post_ref,
                   ds_ref, dpre_ref, dpost_ref, *, n, p, h, iters,
                   final_row, n_vecs):
    pad = ((0, 0), (0, p - n), (0, p - n))
    s = s_ref[...].astype(jnp.float32).reshape(h, n, n)
    gy = g_ref[...].astype(jnp.float32).reshape(h, n, n)
    if p != n:
        s = jnp.pad(s, pad)
        gy = jnp.pad(gy, pad)
    vecs = vec_ref[...].reshape(h, -1, p)[:, :n_vecs]
    m = _mix(s, pre_ref, h)                      # recompute (cheaper than
    # storing a second N² residual per head)
    gw = _mix(gy, post_ref, h, transpose=True)   # vjp of the post-mix
    dm, w = _norm_bwd_math(m, gw, vecs, n=n, iters=iters,
                           final_row=final_row, want_out=True)
    ds = _mix(dm, pre_ref, h, transpose=True)    # vjp of the pre-mix
    ds_ref[...] = ds[:, :n, :n].reshape(1, h, n, n).astype(ds_ref.dtype)

    dpre = _plane_bilinear(s, dm)
    dpost = _plane_bilinear(w, gy)
    # H×H parameter grads accumulate across the (sequential) batch grid —
    # the output block is revisited, staying VMEM-resident
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dpre_ref[...] = dpre
        dpost_ref[...] = dpost

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        dpre_ref[...] = dpre_ref[...] + dpre
        dpost_ref[...] = dpost_ref[...] + dpost


def _smem_spec(h):
    return pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.SMEM)


@functools.partial(
    jax.jit, static_argnames=("iters", "final_row", "interpret", "want_vecs")
)
def _th_fwd_impl(dots, pre, post, iters, final_row, interpret,
                 want_vecs=False):
    b, h, n, _ = dots.shape
    p = _round_up(n, 8)
    vec_rows = _vec_rows(iters, final_row, True)
    kernel = functools.partial(
        _th_fwd_kernel, n=n, p=p, h=h, iters=iters, final_row=final_row,
        want_vecs=want_vecs, vec_rows=vec_rows,
    )
    spec_s = pl.BlockSpec((1, h, n, n), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = spec_s
    out_shape = jax.ShapeDtypeStruct((b, h, n, n), dots.dtype)
    if want_vecs:
        out_specs = (out_specs, pl.BlockSpec(
            (1, h, vec_rows, p), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, h, vec_rows, p), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_s, _smem_spec(h), _smem_spec(h)],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=b * h * p * p * (4 + 4 * iters + 4 * h),
            bytes_accessed=2 * b * h * n * n * dots.dtype.itemsize,
            transcendentals=b * h * p * p,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dots, pre.astype(jnp.float32), post.astype(jnp.float32))
    return res


@functools.partial(jax.jit, static_argnames=("iters", "final_row",
                                             "interpret"))
def _th_bwd_impl(dots, g, vecs, pre, post, iters, final_row, interpret):
    b, h, n, _ = dots.shape
    p = _round_up(n, 8)
    kernel = functools.partial(
        _th_bwd_kernel, n=n, p=p, h=h, iters=iters, final_row=final_row,
        n_vecs=_num_vecs(iters, final_row, True),
    )
    spec_s = pl.BlockSpec((1, h, n, n), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vecs = pl.BlockSpec((1, h, vecs.shape[2], p),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_hh = pl.BlockSpec((h, h), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    ds, dpre, dpost = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_s, spec_s, spec_vecs, _smem_spec(h), _smem_spec(h)],
        out_specs=(spec_s, spec_hh, spec_hh),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, n), dots.dtype),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * h * p * p * (8 + 4 * iters + 8 * h),
            bytes_accessed=3 * b * h * n * n * dots.dtype.itemsize,
            transcendentals=b * h * p * p,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(dots, g, vecs, pre.astype(jnp.float32), post.astype(jnp.float32))
    return ds, dpre, dpost


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def talking_heads_sinkhorn(dots, mix_pre, mix_post, num_iters=3,
                           final_row_norm=True, interpret=False):
    """``postmix(sinkhorn_attention(premix(dots)))`` fused in one kernel
    (ref cait.py:110-119 mixing around the ref utils.py:1025-1037
    normalization). ``dots [B, H, N, N]`` square, ``mix_* [H, H]``;
    differentiable in all three; output dtype = dots dtype (math in f32)."""
    return _th_fwd_impl(dots, mix_pre, mix_post, num_iters, final_row_norm,
                        interpret, want_vecs=False)


def _th_fwd(dots, mix_pre, mix_post, num_iters, final_row_norm, interpret):
    out, vecs = _th_fwd_impl(dots, mix_pre, mix_post, num_iters,
                             final_row_norm, interpret, want_vecs=True)
    return out, (dots, vecs, mix_pre, mix_post)


def _th_bwd(num_iters, final_row_norm, interpret, res, g):
    dots, vecs, mix_pre, mix_post = res
    ds, dpre, dpost = _th_bwd_impl(dots, g, vecs, mix_pre, mix_post,
                                   num_iters, final_row_norm, interpret)
    return ds, dpre.astype(mix_pre.dtype), dpost.astype(mix_post.dtype)


talking_heads_sinkhorn.defvjp(_th_fwd, _th_bwd)


def talking_heads_supported(shape, num_iters: int) -> bool:
    """Shape gate (caller falls back to the unfused einsum + XLA/kernel
    path): 4D square [B,H,N,N] with all H heads of one image resident in
    VMEM — the mixes couple heads, so H is the chain batch."""
    if len(shape) != 4 or shape[-1] != shape[-2]:
        return False
    if num_iters < 1:
        return False
    b, h, n, _ = shape
    if n < 2 or h < 1 or h > 16 or b < 1:
        return False
    p = _round_up(n, 8)
    if p > _MAX_P:
        return False
    # bwd holds ~10 [p,p] f32 buffers per head (s, gy, m, attn, dm, w +
    # chain internals)
    return h * (10 * p * p * 4 + 16 * p * 4) <= _VMEM_BUDGET
