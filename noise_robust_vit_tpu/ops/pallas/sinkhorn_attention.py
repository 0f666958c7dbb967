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
to Sinkhorn's row/column sums; all-zero padded rows/columns divide by a
`where`-guarded denominator (sum==0 → 1), and live denominators are clamped
at 1e-8 — during training attention can starve a key of mass and the
scaling-vector form would overflow f32 where the reference's matrix-rewrite
form stays ratio-stable (the clamp is inactive at healthy attention mass, so
parity with the reference is unaffected).
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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n, robust, iters, final_row, g):
    # Vector-form Sinkhorn (see ops/sinkhorn.py::sinkhorn_scalings): the
    # post-softmax matrix is only ever rescaled as diag(a)·attn·diag(b), so
    # the kernel iterates scaling vectors and folds them into the output —
    # the N×N matrix stays put in VMEM and is read, never rewritten.
    # ``g`` (batch·head) rows are processed per program (unrolled) to
    # amortize per-program overhead — ~20% over one-head programs at ViT-B.
    for gi in range(g):
        out = _single_head_math(
            q_ref[gi], k_ref[gi], v_ref[gi],
            scale=scale, n=n, robust=robust, iters=iters, final_row=final_row,
        )
        o_ref[gi] = out.astype(o_ref.dtype)


def _pick_group(bh: int, n_pad: int, d: int, arrays: int) -> int:
    """Largest divisor of ``bh`` whose block working set fits a VMEM budget.
    Mosaic's scoped allocation keeps each unrolled head's f32 N×N scratch
    live separately, so the scratch is accounted PER HEAD."""
    budget = 12 * 1024 * 1024
    per_head = n_pad * n_pad * 4 + 2 * arrays * n_pad * d * 2
    for g in (16, 12, 8, 6, 4, 3, 2, 1):
        if bh % g:
            continue
        if g * per_head <= budget:
            return g
    return 1


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

    # pad sequence to lanes; head dim stays unpadded (contraction dim of the
    # first GEMM / output lanes of the second — Mosaic tiles it natively)
    n_pad = _round_up(n, _LANE)
    d_pad = d
    dv_pad = dv
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))

    g = _pick_group(bh, n_pad, max(d_pad, dv_pad), arrays=4)
    kernel = functools.partial(
        _kernel,
        scale=scale,
        n=n,
        robust=robust,
        iters=sinkhorn_iters,
        final_row=final_row_norm,
        g=g,
    )
    flops_norm = n_pad * n_pad * (4 + (4 * sinkhorn_iters if robust else 0))
    out = pl.pallas_call(
        kernel,
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad, dv_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, n_pad, dv_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
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


def _reference_attention(q, k, v, scale, robust, iters, final_row):
    """Pure-JAX math identical to the kernel (used for the backward pass)."""
    from ..sinkhorn import sinkhorn_scalings

    logits = jnp.einsum(
        "...nd,...md->...nm", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    if robust:
        a, b = sinkhorn_scalings(attn, num_iters=iters, final_row_norm=final_row)
        v = v * b[..., :, None].astype(v.dtype)
        out = jnp.einsum(
            "...nm,...md->...nd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return (out * a[..., :, None]).astype(v.dtype)
    return jnp.einsum(
        "...nm,...md->...nd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def _single_head_math(q, k, v, *, scale, n, robust, iters, final_row):
    """Per-(batch,head) attention math in f32, shared by the forward kernel
    and the backward kernel (which differentiates it via jax.vjp *inside* the
    kernel body — the vjp traces to plain dots/reductions Mosaic lowers)."""
    n_pad = q.shape[0]
    s = jax.lax.dot_general(
        q.astype(jnp.float32), k.astype(jnp.float32),
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

    vf = v.astype(jnp.float32)
    if robust:
        def _recip(x):
            # clamped reciprocal (see ops/sinkhorn.py::sinkhorn_scalings):
            # starved keys would overflow f32 in the vector form; the
            # double-where keeps the vjp NaN-free at masked (x==0) entries
            if not needs_mask:
                return 1.0 / jnp.maximum(x, 1e-8)
            safe = jnp.where(x == 0.0, 1.0, jnp.maximum(x, 1e-8))
            return jnp.where(x == 0.0, 1.0, 1.0 / safe)

        b = jnp.ones((1, n_pad), jnp.float32)
        a = jnp.ones((n_pad, 1), jnp.float32)
        for i in range(iters):
            # i == 0: rowsum(softmax) ≡ 1 as a function of the logits (value
            # AND gradient), so the first row normalization is the identity
            if i > 0:
                a = _recip(jnp.sum(attn * b, axis=-1, keepdims=True))
            b = _recip(jnp.sum(attn * a, axis=-2, keepdims=True))
        if final_row:
            a = _recip(jnp.sum(attn * b, axis=-1, keepdims=True))
        vf = vf * b.reshape(n_pad, 1)

    out = jax.lax.dot_general(
        attn, vf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if robust:
        out = out * a
    return out


def _bwd_math_manual(q, k, v, g, *, scale, n, robust, iters, final_row):
    """Hand-derived backward (per head, recompute-in-VMEM).

    Forward is ``O = diag(a)·A·diag(b)·V`` with A = masked softmax and (a, b)
    the Sinkhorn–Knopp vectors. Reverse-mode:

      * direct: dV = b ⊙ (Aᵀ(a⊙G));  dA += (a⊙(G Vᵀ)⊙b);
        da_last = rowsum(G ⊙ A(b⊙V));  db_T += rowsum(Aᵀ(a⊙G) ⊙ V)
      * each reciprocal node x = 1/(A·y) contributes dA += dx' yᵀ and
        dy += Aᵀ dx' with dx' = −dx ⊙ x² (transposed for the b-nodes) —
        rank-1 outer products accumulated into ONE N×N buffer.
      * softmax vjp: dS = A ⊙ (dA − rowsum(dA ⊙ A)); dQ = scale·dS·K,
        dK = scale·dSᵀ·Q. Masked (zero) entries of A annihilate all padded-
        lane junk, so no extra masking is needed here.

    ~3 live N×N f32 buffers vs ~10 for the in-kernel autodiff vjp, which
    allows much larger head groups per program.
    """
    n_pad = q.shape[0]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    s = jax.lax.dot_general(
        qf, kf, dimension_numbers=(((1,), (1,)), ((), ())),
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

    if not robust:
        dv = jax.lax.dot_general(
            attn, gf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dA = jax.lax.dot_general(
            gf, vf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = attn * (dA - jnp.sum(dA * attn, axis=-1, keepdims=True))
        dq = scale * jax.lax.dot_general(
            ds, kf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = scale * jax.lax.dot_general(
            ds, qf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq, dk, dv

    def _recip(x):
        # clamped: see ops/sinkhorn.py::sinkhorn_scalings
        if not needs_mask:
            return 1.0 / jnp.maximum(x, 1e-8)
        safe = jnp.where(x == 0.0, 1.0, jnp.maximum(x, 1e-8))
        return jnp.where(x == 0.0, 1.0, 1.0 / safe)

    # forward vector iteration, storing every a_t [N,1] / b_t [1,N];
    # a_0 ≡ 1 (first row norm of a row softmax is the identity in value and
    # gradient), so its reverse node is skipped below
    bs = [jnp.ones((1, n_pad), jnp.float32)]
    as_ = []
    for i in range(iters):
        if i == 0:
            a_t = jnp.ones((n_pad, 1), jnp.float32)
        else:
            a_t = _recip(jnp.sum(attn * bs[-1], axis=-1, keepdims=True))
        as_.append(a_t)
        b_t = _recip(jnp.sum(attn * a_t, axis=-2, keepdims=True))
        bs.append(b_t)
    if final_row:
        as_.append(_recip(jnp.sum(attn * bs[-1], axis=-1, keepdims=True)))
    a_fin = as_[-1]
    b_fin = bs[-1]

    bv = b_fin.reshape(n_pad, 1) * vf
    o_over_a = jax.lax.dot_general(
        attn, bv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ag = a_fin * gf  # [N, D]
    t1 = jax.lax.dot_general(
        attn, ag, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # Aᵀ(a⊙G), [N, D]
    dv = b_fin.reshape(n_pad, 1) * t1
    # direct dA and vector grads
    dA = (
        a_fin
        * jax.lax.dot_general(
            gf, vf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * b_fin
    )
    da = jnp.sum(gf * o_over_a, axis=-1, keepdims=True)  # for a_last
    db = jnp.sum(t1 * vf, axis=-1, keepdims=True)  # for b_T, as [N,1]

    def mv(mat_T, vec_col):
        # A @ x or Aᵀ @ x with x [N,1] via masked sums (VPU, stays in VMEM)
        if mat_T:
            return jnp.sum(attn * vec_col, axis=-2, keepdims=True)  # [1,N]
        return jnp.sum(attn * vec_col.reshape(1, n_pad), axis=-1, keepdims=True)

    # reverse the iteration
    if final_row:
        # a* = recip(A b_T)
        dr = -da * a_fin * a_fin  # [N,1]
        dA = dA + dr * bs[-1]  # rank-1: [N,1]*[1,N]
        db = db + mv(True, dr).reshape(n_pad, 1)
        da = jnp.zeros_like(da)
    for t in range(iters - 1, -1, -1):
        a_t = as_[t]
        b_t = bs[t + 1]
        # b_t = recip(Aᵀ a_t): db currently holds grad of b_t (as [N,1])
        dc = -db * (b_t * b_t).reshape(n_pad, 1)  # [N,1] repr of [1,N]
        dA = dA + a_t * dc.reshape(1, n_pad)  # rank-1: [N,1]*[1,N]
        if t == 0:
            # a_0 is the constant 1 — its gradient is discarded exactly
            break
        da = da + mv(False, dc)  # A @ dc → grad into a_t
        # a_t = recip(A b_{t-1})
        dr = -da * a_t * a_t
        dA = dA + dr * bs[t]
        db = mv(True, dr).reshape(n_pad, 1)  # grad into b_{t-1}
        da = jnp.zeros_like(da)

    ds = attn * (dA - jnp.sum(dA * attn, axis=-1, keepdims=True))
    dq = scale * jax.lax.dot_general(
        ds, kf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk = scale * jax.lax.dot_general(
        ds, qf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale, n,
                robust, iters, final_row, g):
    for gi in range(g):
        dq, dk, dv = _bwd_math_manual(
            q_ref[gi], k_ref[gi], v_ref[gi], g_ref[gi],
            scale=scale, n=n, robust=robust, iters=iters, final_row=final_row,
        )
        dq_ref[gi] = dq.astype(dq_ref.dtype)
        dk_ref[gi] = dk.astype(dk_ref.dtype)
        dv_ref[gi] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "robust", "sinkhorn_iters", "final_row_norm")
)
def _fused_attention_bwd_impl(q, k, v, g, scale, robust, sinkhorn_iters, final_row_norm):
    *batch, n, d = q.shape
    bh = 1
    for bdim in batch:
        bh *= bdim
    q, k, v, g = (t.reshape(bh, n, -1) for t in (q, k, v, g))
    n_pad = _round_up(n, _LANE)
    if n_pad != n:
        q, k, v, g = (
            jnp.pad(t, ((0, 0), (0, n_pad - n), (0, 0))) for t in (q, k, v, g)
        )
    dv_dim = v.shape[-1]
    # the hand-derived backward keeps ~4 N×N f32 buffers live per head
    per_head = 4 * n_pad * n_pad * 4 + 2 * 7 * n_pad * max(d, dv_dim) * 2
    gb = 1
    for cand in (8, 6, 4, 3, 2, 1):
        if bh % cand:
            continue
        if cand * per_head <= 12 * 1024 * 1024:
            gb = cand
            break
    kernel = functools.partial(
        _bwd_kernel, scale=scale, n=n, robust=robust, iters=sinkhorn_iters,
        final_row=final_row_norm, g=gb,
    )
    spec_d = pl.BlockSpec((gb, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_dv = pl.BlockSpec((gb, n_pad, dv_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // gb,),
        in_specs=[spec_d, spec_d, spec_dv, spec_dv],
        out_specs=(spec_d, spec_d, spec_dv),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, dv_dim), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=bh * 10 * n_pad * n_pad * d,
            bytes_accessed=bh * n_pad * (4 * d + 4 * dv_dim) * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
    )(q, k, v, g)
    dq, dk, dv = (t[:, :n, :] for t in (dq, dk, dv))
    return (
        dq.reshape(*batch, n, d),
        dk.reshape(*batch, n, d),
        dv.reshape(*batch, n, dv_dim),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attention_op(q, k, v, scale, robust, sinkhorn_iters, final_row_norm):
    return _fused_attention_impl(q, k, v, scale, robust, sinkhorn_iters, final_row_norm)


def _attention_fwd(q, k, v, scale, robust, sinkhorn_iters, final_row_norm):
    out = _fused_attention_impl(q, k, v, scale, robust, sinkhorn_iters, final_row_norm)
    return out, (q, k, v)


def _attention_bwd(scale, robust, sinkhorn_iters, final_row_norm, res, g):
    q, k, v = res
    return _fused_attention_bwd_impl(
        q, k, v, g, scale, robust, sinkhorn_iters, final_row_norm
    )


_attention_op.defvjp(_attention_fwd, _attention_bwd)


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
    if _round_up(n, _LANE) > _MAX_N_PAD or d > _MAX_D_PAD or v.shape[-1] > _MAX_D_PAD:
        return None
    if scale is None:
        scale = d**-0.5
    return _attention_op(
        q, k, v, float(scale), bool(robust), int(sinkhorn_iters), bool(final_row_norm)
    )
