"""Fused windowed attention kernel with additive bias (Swin/LeViT/MaxViT
path; the survey's "specialized windowed kernel", SURVEY.md §5).

Windowed models compute, per (batch, window, head), a SMALL N×N attention
(N = 49…256) with an additive bias that is SHARED ACROSS THE BATCH — the
relative-position bias (+ the shift mask for shifted windows). The fusion
opportunity is the same as for global attention (keep the N² matrix in VMEM
through softmax + Sinkhorn) plus one new wrinkle: the bias needs a gradient,
accumulated over the batch.

Layout contract: ``q, k, v`` are ``[B, W, H, N, D]`` (batch, windows, heads)
and ``bias`` is ``[W·H, N, N]`` (the per-window-head additive logits term,
already = rel-pos-bias + shift mask). Padding is asymmetric: query rows to a
sublane multiple (8), key/value rows to a lane multiple (128) so the N×N
score matrix is tile-aligned with no partial-lane slicing.

Three kernels:

  * forward — grid over flattened (B·W·H)/G groups; bias blocks follow the
    group index modulo W·H (consecutive flat items share the window and walk
    the head axis, so a G | H group covers a contiguous bias slab);
  * backward A — same grid, hand-derived dq/dk/dv (recompute-in-VMEM; the
    Sinkhorn reverse pass is the rank-1-outer-product accumulation of
    ``sinkhorn_attention._bwd_math_manual``);
  * backward B — grid over (W, H), a ``fori_loop`` over the batch inside the
    kernel accumulating dbias for one (window, head) slab in VMEM (the batch
    is the innermost loop, so the accumulator never leaves the chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_window_attention"]

_LANE = 128
_SUB = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_matrix(q, k, bias, *, scale, n):
    """q [Nq, D], k [Nk, D] (Nk lane-padded), bias [Nq, Nk] → A [Nq, Nk]."""
    s = jax.lax.dot_general(
        q.astype(jnp.float32), k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias
    nq, nk = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    s = jnp.where(col < n, s, -1e9)
    attn = jax.nn.softmax(s, axis=-1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
    return jnp.where((row < n) & (col < n), attn, 0.0)


def _recip(x):
    # clamped: see ops/sinkhorn.py::sinkhorn_scalings
    safe = jnp.where(x == 0.0, 1.0, jnp.maximum(x, 1e-8))
    return jnp.where(x == 0.0, 1.0, 1.0 / safe)


def _sinkhorn_vectors(attn, *, iters, final_row):
    # a_0 ≡ 1: the first row norm of a row softmax is the identity in value
    # and gradient (see ops/sinkhorn.py)
    nq, nk = attn.shape
    bs = [jnp.ones((1, nk), jnp.float32)]
    as_ = []
    for i in range(iters):
        if i == 0:
            a_t = jnp.ones((nq, 1), jnp.float32)
        else:
            a_t = _recip(jnp.sum(attn * bs[-1], axis=-1, keepdims=True))
        as_.append(a_t)
        bs.append(_recip(jnp.sum(attn * a_t, axis=-2, keepdims=True)))
    if final_row:
        as_.append(_recip(jnp.sum(attn * bs[-1], axis=-1, keepdims=True)))
    return as_, bs


def _head_forward(q, k, v, bias, *, scale, n, robust, iters, final_row):
    attn = _attn_matrix(q, k, bias, scale=scale, n=n)
    vf = v.astype(jnp.float32)
    if robust:
        as_, bs = _sinkhorn_vectors(attn, iters=iters, final_row=final_row)
        vf = vf * bs[-1].reshape(-1, 1)
    out = jax.lax.dot_general(
        attn, vf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if robust:
        out = out * as_[-1]
    return out


def _da_dv(attn, vf, gf, *, robust, iters, final_row):
    """Reverse pass through (optionally Sinkhorn-scaled) ``attn @ v``:
    returns (dA, dv) given upstream grad gf. Shapes: attn [Nq,Nk],
    vf [Nk,D], gf [Nq,D]."""
    if not robust:
        dv = jax.lax.dot_general(
            attn, gf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dA = jax.lax.dot_general(
            gf, vf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dA, dv

    nk = vf.shape[0]
    as_, bs = _sinkhorn_vectors(attn, iters=iters, final_row=final_row)
    a_fin, b_fin = as_[-1], bs[-1]
    bv = b_fin.reshape(nk, 1) * vf
    o_over_a = jax.lax.dot_general(
        attn, bv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ag = a_fin * gf
    t1 = jax.lax.dot_general(
        attn, ag, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv = b_fin.reshape(nk, 1) * t1
    dA = (
        a_fin
        * jax.lax.dot_general(
            gf, vf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * b_fin
    )
    da = jnp.sum(gf * o_over_a, axis=-1, keepdims=True)
    db = jnp.sum(t1 * vf, axis=-1, keepdims=True)  # [Nk,1]

    def mv_T(vec_col_q):  # Aᵀ x, x [Nq,1] → [1,Nk]
        return jnp.sum(attn * vec_col_q, axis=-2, keepdims=True)

    def mv(vec_col_k):  # A x, x [Nk,1] → [Nq,1]
        return jnp.sum(attn * vec_col_k.reshape(1, nk), axis=-1, keepdims=True)

    if final_row:
        dr = -da * a_fin * a_fin
        dA = dA + dr * bs[-1]
        db = db + mv_T(dr).reshape(nk, 1)
        da = jnp.zeros_like(da)
    for t in range(iters - 1, -1, -1):
        a_t, b_t = as_[t], bs[t + 1]
        dc = -db * (b_t * b_t).reshape(nk, 1)
        dA = dA + a_t * dc.reshape(1, nk)
        if t == 0:
            break  # a_0 is the constant 1; its gradient is discarded exactly
        da = da + mv(dc)
        dr = -da * a_t * a_t
        dA = dA + dr * bs[t]
        db = mv_T(dr).reshape(nk, 1)
        da = jnp.zeros_like(da)
    return dA, dv


def _head_backward_qkv(q, k, v, g, bias, *, scale, n, robust, iters, final_row):
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    attn = _attn_matrix(qf, kf, bias, scale=scale, n=n)
    dA, dv = _da_dv(attn, vf, gf, robust=robust, iters=iters, final_row=final_row)
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


def _pick_group(total: int, wh: int, nq: int, nk: int, d: int, buffers: int) -> int:
    """g must divide both the flat item count and W·H (so a group's bias rows
    are one contiguous slab that never straddles the batch boundary).
    VMEM blocks are lane-padded, so the feature dim counts as ≥128."""
    d_eff = max(d, _LANE)
    per_item = buffers * nq * nk * 4 + 10 * nk * d_eff * 2
    budget = 10 * 1024 * 1024
    for g in (16, 8, 4, 2, 1):
        if total % g or wh % g:
            continue
        if g * per_item <= budget:
            return g
    return 1


def _pad_qkv(q, k, v, n, nq, nk, flat, d, dv):
    qf = q.reshape(flat, n, d)
    kf = k.reshape(flat, n, d)
    vf = v.reshape(flat, n, dv)
    qf = jnp.pad(qf, ((0, 0), (0, nq - n), (0, 0))) if nq != n else qf
    if nk != n:
        kf = jnp.pad(kf, ((0, 0), (0, nk - n), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk - n), (0, 0)))
    return qf, kf, vf


@functools.partial(
    jax.jit, static_argnames=("scale", "robust", "iters", "final_row")
)
def _window_fwd(q, k, v, bias, scale, robust, iters, final_row):
    b, w, h, n, d = q.shape
    dv = v.shape[-1]
    wh = w * h
    nq = _round_up(n, _SUB)
    nk = _round_up(n, _LANE)
    flat = b * w * h
    qf, kf, vf = _pad_qkv(q, k, v, n, nq, nk, flat, d, dv)
    bias_p = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, nq - n), (0, nk - n)))

    g = _pick_group(flat, wh, nq, nk, d, buffers=2)

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        for gi in range(g):
            out = _head_forward(
                q_ref[gi], k_ref[gi], v_ref[gi], b_ref[gi],
                scale=scale, n=n, robust=robust, iters=iters,
                final_row=final_row,
            )
            o_ref[gi] = out.astype(o_ref.dtype)

    qspec = pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((g, nk, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((g, nq, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (g, nq, nk), lambda i: (i % (wh // g), 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(flat // g,),
        in_specs=[qspec, kspec, vspec, bias_spec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((flat, nq, dv), v.dtype),
    )(qf, kf, vf, bias_p)
    return out[:, :n, :].reshape(b, w, h, n, dv)


@functools.partial(
    jax.jit, static_argnames=("scale", "robust", "iters", "final_row")
)
def _window_bwd_qkv(q, k, v, g_out, bias, scale, robust, iters, final_row):
    b, w, h, n, d = q.shape
    dv = v.shape[-1]
    wh = w * h
    nq = _round_up(n, _SUB)
    nk = _round_up(n, _LANE)
    flat = b * w * h
    qf, kf, vf = _pad_qkv(q, k, v, n, nq, nk, flat, d, dv)
    gf = g_out.reshape(flat, n, dv)
    if nq != n:
        gf = jnp.pad(gf, ((0, 0), (0, nq - n), (0, 0)))
    bias_p = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, nq - n), (0, nk - n)))
    gg = _pick_group(flat, wh, nq, nk, d, buffers=4)

    def kernel(q_ref, k_ref, v_ref, g_ref, b_ref, dq_ref, dk_ref, dv_ref):
        for gi in range(gg):
            dq, dk, dv = _head_backward_qkv(
                q_ref[gi], k_ref[gi], v_ref[gi], g_ref[gi], b_ref[gi],
                scale=scale, n=n, robust=robust, iters=iters,
                final_row=final_row,
            )
            dq_ref[gi] = dq.astype(dq_ref.dtype)
            dk_ref[gi] = dk.astype(dk_ref.dtype)
            dv_ref[gi] = dv.astype(dv_ref.dtype)

    qspec = pl.BlockSpec((gg, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((gg, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((gg, nk, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((gg, nq, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (gg, nq, nk), lambda i: (i % (wh // gg), 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dvv = pl.pallas_call(
        kernel,
        grid=(flat // gg,),
        in_specs=[qspec, kspec, vspec, gspec, bias_spec],
        out_specs=(qspec, kspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((flat, nq, d), q.dtype),
            jax.ShapeDtypeStruct((flat, nk, d), k.dtype),
            jax.ShapeDtypeStruct((flat, nk, dv), v.dtype),
        ),
    )(qf, kf, vf, gf, bias_p)
    dq = dq[:, :n, :].reshape(b, w, h, n, d)
    dk = dk[:, :n, :].reshape(b, w, h, n, d)
    dvv = dvv[:, :n, :].reshape(b, w, h, n, dv)
    return dq, dk, dvv


@functools.partial(
    jax.jit, static_argnames=("scale", "robust", "iters", "final_row")
)
def _window_bwd_bias(q, k, v, g_out, bias, scale, robust, iters, final_row):
    """dbias [W·H, N, N]: one grid step per (window, head), fori over batch."""
    b, w, h, n, d = q.shape
    dv = v.shape[-1]
    nq = _round_up(n, _SUB)
    nk = _round_up(n, _LANE)
    pad_k = ((0, 0), (0, 0), (0, 0), (0, nk - n), (0, 0))
    pad_q = ((0, 0), (0, 0), (0, 0), (0, nq - n), (0, 0))
    qp = jnp.pad(q, pad_q) if nq != n else q
    gp = jnp.pad(g_out, pad_q) if nq != n else g_out
    kp = jnp.pad(k, pad_k) if nk != n else k
    vp = jnp.pad(v, pad_k) if nk != n else v
    bias_p = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, nq - n), (0, nk - n)))

    # batch chunking: VMEM blocks are lane-padded (d=32 → 128), so a full
    # batch per block overflows scoped VMEM; instead the batch axis becomes
    # the INNERMOST grid dimension and the dbias block is revisited —
    # zeroed on the first chunk, accumulated on the rest.
    bc = b
    while bc > 8 and (2 * bc * (nq + 3 * nk) * _LANE * 2) > 6 * 1024 * 1024:
        bc //= 2
    while b % bc:
        bc -= 1
    nb = b // bc

    def kernel(q_ref, k_ref, v_ref, g_ref, b_ref, db_ref):
        def body(bi, acc):
            attn = _attn_matrix(
                q_ref[bi, 0, 0].astype(jnp.float32),
                k_ref[bi, 0, 0].astype(jnp.float32),
                b_ref[0], scale=scale, n=n,
            )
            dA, _ = _da_dv(
                attn,
                v_ref[bi, 0, 0].astype(jnp.float32),
                g_ref[bi, 0, 0].astype(jnp.float32),
                robust=robust, iters=iters, final_row=final_row,
            )
            return acc + attn * (dA - jnp.sum(dA * attn, axis=-1, keepdims=True))

        acc = jax.lax.fori_loop(0, bc, body, jnp.zeros((nq, nk), jnp.float32))

        @pl.when(pl.program_id(2) == 0)
        def _():
            db_ref[0] = acc

        @pl.when(pl.program_id(2) != 0)
        def _():
            db_ref[0] = db_ref[0] + acc

    qspec = pl.BlockSpec(
        (bc, 1, 1, nq, d), lambda wi, hi, bi: (bi, wi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kspec = pl.BlockSpec(
        (bc, 1, 1, nk, d), lambda wi, hi, bi: (bi, wi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vspec = pl.BlockSpec(
        (bc, 1, 1, nk, dv), lambda wi, hi, bi: (bi, wi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gspec = pl.BlockSpec(
        (bc, 1, 1, nq, dv), lambda wi, hi, bi: (bi, wi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, nq, nk), lambda wi, hi, bi: (wi * h + hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dbias = pl.pallas_call(
        kernel,
        grid=(w, h, nb),
        in_specs=[qspec, kspec, vspec, gspec, bias_spec],
        out_specs=bias_spec,
        out_shape=jax.ShapeDtypeStruct((w * h, nq, nk), jnp.float32),
    )(qp, kp, vp, gp, bias_p)
    return dbias[:, :n, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _window_attention_op(q, k, v, bias, scale, robust, iters, final_row):
    return _window_fwd(q, k, v, bias, scale, robust, iters, final_row)


def _wa_fwd(q, k, v, bias, scale, robust, iters, final_row):
    out = _window_fwd(q, k, v, bias, scale, robust, iters, final_row)
    return out, (q, k, v, bias)


def _wa_bwd(scale, robust, iters, final_row, res, g_out):
    q, k, v, bias = res
    dq, dk, dv = _window_bwd_qkv(
        q, k, v, g_out, bias, scale, robust, iters, final_row
    )
    dbias = _window_bwd_bias(
        q, k, v, g_out, bias, scale, robust, iters, final_row
    )
    return dq, dk, dv, dbias.astype(bias.dtype)


_window_attention_op.defvjp(_wa_fwd, _wa_bwd)


def fused_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    *,
    scale: float | None = None,
    robust: bool = False,
    sinkhorn_iters: int = 3,
    final_row_norm: bool = True,
) -> jax.Array | None:
    """Fused windowed attention, or None when unsupported (caller falls back
    to the XLA path).

    q/k/v: ``[B, W, H, N, D]``; bias: ``[W·H, N, N]`` additive logits term
    (rel-pos bias + shift mask, broadcast over the batch).
    """
    if q.ndim != 5 or bias.ndim != 3:
        return None
    b, w, h, n, d = q.shape
    if bias.shape != (w * h, n, n):
        return None
    if _round_up(n, _LANE) > 512 or d > 256 or v.shape[-1] > 256:
        return None
    if n < 96:
        # many tiny windows lose to XLA's batched GEMMs: per-window grid
        # programs (and the sequential dbias reduction) serialize what XLA
        # runs as one batched matmul (measured: swin_t robust 185 vs
        # 491 img/s). The kernel pays off only for large-N windows
        # (LeViT's full-map "window", N≈196).
        return None
    if scale is None:
        scale = d**-0.5
    return _window_attention_op(
        q, k, v, bias, float(scale), bool(robust), int(sinkhorn_iters),
        bool(final_row_norm),
    )
