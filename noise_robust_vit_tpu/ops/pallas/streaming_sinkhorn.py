"""Streaming q/k/v-interface Sinkhorn attention — the giant-N robust path.

CvT's stage-1 attention is [B, 1, 3136, 784] (56×56 queries against
stride-2 keys, ref cvt.py:60-102): one padded f32 logits buffer is 11.2 MB,
so the resident logits-interface kernels are architecturally out (the bwd
chain holds ~6 live N² buffers > the 40 MB Mosaic scoped-VMEM ceiling even
at group 1 — RESULTS.md round-4 "CvT stage-1 analysis"), and the XLA
vector form re-reads the N² matrix from HBM for every Sinkhorn reduction
(~6 ms/batch/pass at stage-1 vs ~0.8 ms of MXU recompute).

This kernel therefore never materializes the matrix AT ALL — in HBM *or*
in VMEM. It works at the q/k/v interface, flash-style: q, k, v for one
(batch, head) item stay resident in VMEM (≤ 2.4 MB at stage-1) and every
Sinkhorn reduction is a streaming sweep over query tiles that recomputes
``en = exp(scale·q·kᵀ − lse)`` on the MXU per tile.

Two structural facts keep the sweep count minimal:

* a whole attention ROW lives inside one query tile, so every row-side
  quantity (the softmax lse, each row-scaling update a = 1/(en·b), the
  final output rows) is complete in-tile and rides the SAME sweep as the
  next column accumulation;
* the first row normalization after the softmax is the exact identity
  (value and gradient), the same skip the resident kernels use.

Forward sweeps for the (3, final-row) schedule: lse+b₁ → a₂+b₂ → a₃+b₃ →
a_f+output = 4 recompute sweeps. Backward: output-direct (dv, db_F) →
iters−1 fused (row-matvec + column-accumulation) chain sweeps → one final
sweep applying the rank-1 dA stack as a K≤8-contraction MXU matmul plus
the rank-D direct term, with the softmax-vjp row term folded in-tile
(ds = en ⊙ (dA − ρ)).

Semantics match ``sinkhorn_attention``'s vector form exactly
(ops/sinkhorn.py::sinkhorn_scalings, the reference's utils.py:1025-1037 /
:218-224 schedules), including the clamped double-where reciprocal.
Rectangular N×M is native (Twins' subsampled global attention,
ref twins_svt.py:122-153, is served by the same kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sinkhorn_attention import _round_up

__all__ = ["streaming_attention", "streaming_supported"]

import os as _os

_NEG = -1e30
_BIG = 1e30
_STREAM_VMEM_LIMIT = int(
    _os.environ.get("NRV_STREAM_VMEM_LIMIT", 64 * 1024 * 1024)
)


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_STREAM_VMEM_LIMIT)


def _tile(n: int) -> tuple[int, int]:
    """(tq, n_pad): sweep-tile rows and padded N.

    Prefer a tq that DIVIDES round_up(n, 8) (largest multiple of 8 in
    [128, 512]) so n_pad == np8 and the host-side q/g buffers need no
    padded copy at all — at the shapes this kernel serves the copies are
    the HBM hogs, not the math (Twins s1: [1024, 3200, 64] bf16 = 840 MB
    physical per copy; n = 3136 = 7²·2⁶ has tq = 448 exactly). Fall back
    to 256-row tiles with padding when no divisor exists."""
    np8 = _round_up(n, 8)
    if np8 <= 512:
        return np8, np8
    for tq in range(512, 127, -8):
        if np8 % tq == 0:
            return tq, np8
    return 256, _round_up(n, 256)


def _n_avecs(iters: int, final_row: bool) -> int:
    return max(iters - 1, 0) + (1 if final_row else 0)


def _recip(x):
    # clamped double-where reciprocal — ops/sinkhorn.py::sinkhorn_scalings
    safe = jnp.where(x == 0.0, 1.0, jnp.maximum(x, 1e-8))
    return jnp.where(x == 0.0, 1.0, 1.0 / safe)


def _en_tile(q_ref, k32, lse_col, off, tq, scale, colmask):
    """Recompute the row-stochastic tile en = exp(scale·q_t·kᵀ − lse_t).
    Padded rows carry lse = +BIG → en ≡ 0; padded cols are masked to −BIG
    before the exp → en ≡ 0."""
    qt = q_ref[0, pl.ds(off, tq), :].astype(jnp.float32)
    s = jax.lax.dot_general(
        qt, k32, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(colmask, s, _NEG)
    return jnp.exp(s - lse_col), qt


def _stream_fwd_kernel(q_ref, k_ref, v_ref, *rest, scale, n, m, n_pad, m_pad,
                       tq, iters, final_row, want_vecs):
    # avs scratch holds lse + the a-vectors COLUMN-major in VMEM (free);
    # the HBM residuals are ROW-major — [1, a_cols, Np] / [1, iters, Mp] —
    # so the lane dim is N/M, not the tiny vector count (a [r, Np, 4] f32
    # residual lane-pads 4 → 128: 32× HBM, the round-1 column-layout OOM
    # lesson re-learned on this kernel at Twins s1). One batched
    # transpose per program moves scratch → residual.
    if want_vecs:
        o_ref, av_ref, bv_ref, bcur, avs = rest
    else:
        o_ref, bcur, avs = rest
        av_ref = bv_ref = None
    nt = n_pad // tq
    k32 = k_ref[0].astype(jnp.float32)
    colmask = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1) < m

    # ---- sweep 0: softmax lse per row (complete in-tile) + the first
    # column sum (the a-update is skipped: rowsum(softmax) ≡ 1)
    bcur[...] = jnp.zeros((1, m_pad), jnp.float32)
    for ti in range(nt):
        off = ti * tq
        qt = q_ref[0, pl.ds(off, tq), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qt, k32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(colmask, s, _NEG)
        mx = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - mx)
        sm = jnp.sum(e, axis=-1, keepdims=True)
        lse = mx + jnp.log(sm)
        rmask = (off + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)) < n
        # padded rows: lse = +BIG makes every later recompute of this row
        # exactly zero, so column sums stay clean with no per-sweep masking
        lse = jnp.where(rmask, lse, _BIG)
        avs[pl.ds(off, tq), 0:1] = lse
        en = jnp.where(rmask, e / sm, 0.0)
        bcur[...] = bcur[...] + jnp.sum(en, axis=0, keepdims=True)

    def lse_col(ti):
        return avs[pl.ds(ti * tq, tq), 0:1]

    b = _recip(bcur[...])  # [1, Mp]
    if want_vecs:
        bv_ref[0, 0:1, :] = b

    # ---- middle sweeps: one per remaining Sinkhorn iteration — the row
    # update a_i is complete in-tile and feeds the next column accumulation
    a_slot = 1  # avs column 0 is the lse
    for i in range(1, iters):
        bcur[...] = jnp.zeros((1, m_pad), jnp.float32)
        for ti in range(nt):
            off = ti * tq
            en, _ = _en_tile(q_ref, k32, lse_col(ti), off, tq, scale,
                             colmask)
            u = jnp.sum(en * b, axis=-1, keepdims=True)
            a = _recip(u)
            avs[pl.ds(off, tq), a_slot:a_slot + 1] = a
            bcur[...] = bcur[...] + jnp.sum(en * a, axis=0, keepdims=True)
        a_slot += 1
        b = _recip(bcur[...])
        if want_vecs:
            bv_ref[0, i:i + 1, :] = b

    # ---- output sweep: the final row update (if any) is in-tile; rows of
    # the output are complete per tile. Without a final row norm the output
    # scaling is the LAST a — read back from scratch or recomputed in-tile
    # from the b it consumed (iters == 1, no-vecs path has no stored a).
    v32 = v_ref[0].astype(jnp.float32) * b.reshape(m_pad, 1)
    for ti in range(nt):
        off = ti * tq
        en, _ = _en_tile(q_ref, k32, lse_col(ti), off, tq, scale, colmask)
        if final_row:
            u = jnp.sum(en * b, axis=-1, keepdims=True)
            a = _recip(u)
            avs[pl.ds(off, tq), a_slot:a_slot + 1] = a
        elif iters == 1:
            a = 1.0
        else:
            a = avs[pl.ds(off, tq), a_slot - 1:a_slot]
        out = a * jax.lax.dot_general(
            en, v32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, pl.ds(off, tq), :] = out.astype(o_ref.dtype)
    if want_vecs:
        # ONE batched lane↔sublane transpose of the whole stack
        av_ref[0] = jnp.swapaxes(avs[...], 0, 1)


def _stream_bwd_kernel(q_ref, k_ref, v_ref, g_ref, av_ref, bv_ref,
                       dq_ref, dk_ref, dv_ref,
                       bcur, dcol, pt_ref, qs_ref, tacc, dkacc, avs, goacc,
                       *, scale, n, m, n_pad, m_pad, tq, iters, final_row):
    nt = n_pad // tq
    k32 = k_ref[0].astype(jnp.float32)
    v32 = v_ref[0].astype(jnp.float32)
    colmask = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1) < m
    n_av = _n_avecs(iters, final_row)

    # residuals arrive ROW-major ([a_cols, Np] / [iters, Mp] — see the fwd
    # kernel's layout note); ONE batched transpose restores the column
    # working form in VMEM scratch
    avs[...] = jnp.swapaxes(av_ref[0], 0, 1)

    def a_col(idx):  # 0-based a index → avs column (col 0 is lse)
        return avs[:, idx + 1:idx + 2]  # [Np, 1]

    def b_row(idx):
        return bv_ref[0, idx:idx + 1, :]  # [1, Mp]

    def lse_col(ti):
        return avs[pl.ds(ti * tq, tq), 0:1]

    g32 = g_ref[0].astype(jnp.float32)
    aF = a_col(n_av - 1) if n_av else jnp.ones((n_pad, 1), jnp.float32)
    bF_row = b_row(iters - 1)
    bF = bF_row.reshape(m_pad, 1)
    kp = pt_ref.shape[-1]
    pt_ref[...] = jnp.zeros((n_pad, kp), jnp.float32)
    qs_ref[...] = jnp.zeros((kp, m_pad), jnp.float32)

    slot = 0
    if final_row:
        qs_ref[slot:slot + 1, :] = bF_row
    bFv = v32 * bF  # [Mp, D]

    # ---- sweep B1: T = enᵀ(a_F ⊙ g) gives dv and the direct db_F. The
    # forward output row block o_t = a_F ⊙ (en · (b_F ⊙ v)) is RECOMPUTED
    # here (one extra MXU matmul per tile) so the backward needs no padded
    # copy of o at all; go = rowsum(g ⊙ o) — the softmax row term and
    # (via daF = go/aF) the final-scaling gradient — lands in goacc. The
    # final-row du_F propagation rides the same sweep.
    tacc[...] = jnp.zeros((m_pad, tacc.shape[-1]), jnp.float32)
    dcol[...] = jnp.zeros((1, m_pad), jnp.float32)
    for ti in range(nt):
        off = ti * tq
        en, _ = _en_tile(q_ref, k32, lse_col(ti), off, tq, scale, colmask)
        aF_t = aF[off:off + tq, :]
        g_t = g32[off:off + tq, :]
        ag_t = aF_t * g_t
        tacc[...] = tacc[...] + jax.lax.dot_general(
            en, ag_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ev_t = jax.lax.dot_general(
            en, bFv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # = o_t / a_F
        go_t = jnp.sum(ag_t * ev_t, axis=-1, keepdims=True)
        goacc[pl.ds(off, tq), :] = go_t
        if final_row:
            # duF = −daF·aF² with daF = go/aF → −go·aF
            duF_t = -go_t * aF_t
            pt_ref[pl.ds(off, tq), 0:1] = duF_t
            dcol[...] = dcol[...] + jax.lax.dot_general(
                duF_t, en, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if final_row:
        slot += 1
    dv_full = bF * tacc[:, :]
    dv_ref[0, :, :] = dv_full.astype(dv_ref.dtype)
    db = (jnp.sum(v32 * tacc[...], axis=-1, keepdims=True).reshape(1, m_pad)
          + dcol[...])  # [1, Mp] — gradient on b_{iters-1}

    # ---- reverse chain: for b_i (i = iters-1 … 1) one fused sweep does the
    # row matvec (da for the a that fed b_i) and the next column
    # accumulation (db for b_{i-1}); b_0's pair closes the chain
    for i in range(iters - 1, 0, -1):
        bi = b_row(i)
        dw = -db * bi * bi  # [1, Mp]
        # pair (a_prev, dw): a_prev is the a used in b_i's update (a-index i-1)
        pt_ref[:, slot:slot + 1] = a_col(i - 1)
        qs_ref[slot:slot + 1, :] = dw
        dw_col = dw.reshape(m_pad, 1)
        chain_head = not final_row and i == iters - 1
        bcur[...] = jnp.zeros((1, m_pad), jnp.float32)
        for ti in range(nt):
            off = ti * tq
            en, _ = _en_tile(q_ref, k32, lse_col(ti), off, tq, scale,
                             colmask)
            da_t = jax.lax.dot_general(
                en, dw_col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            a_t = a_col(i - 1)[off:off + tq, :]
            if chain_head:
                # the output's da seed: daF = go / aF (aF = a_{iters-1},
                # clamped-reciprocal → strictly positive)
                da_t = da_t + goacc[pl.ds(off, tq), :] / aF[off:off + tq, :]
            du_t = -da_t * a_t * a_t
            pt_ref[pl.ds(off, tq), slot + 1:slot + 2] = du_t
            bcur[...] = bcur[...] + jax.lax.dot_general(
                du_t, en, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # pair (du, b_{i-1}) for the row update a_{i-1}
        qs_ref[slot + 1:slot + 2, :] = b_row(i - 1)
        slot += 2
        db = bcur[...]
    # b_0 = recip(colsum(en)) — its a side is the constant ones
    b0 = b_row(0)
    dw0 = -db * b0 * b0
    pt_ref[:, slot:slot + 1] = jnp.ones((n_pad, 1), jnp.float32)
    qs_ref[slot:slot + 1, :] = dw0
    slot += 1

    # ---- final sweep: dA = rank-1 stack + rank-D direct term; the softmax
    # vjp row term ρ = Σ_t p_t·(en·q_t) + rowsum(g⊙O) is complete in-tile
    dkacc[...] = jnp.zeros((m_pad, dkacc.shape[-1]), jnp.float32)
    for ti in range(nt):
        off = ti * tq
        en, qt = _en_tile(q_ref, k32, lse_col(ti), off, tq, scale, colmask)
        pt_t = pt_ref[pl.ds(off, tq), :]  # [tq, 8]
        eq = jax.lax.dot_general(
            en, qs_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tq, 8]
        rho = (jnp.sum(pt_t * eq, axis=-1, keepdims=True)
               + goacc[pl.ds(off, tq), :])
        af_t = (a_col(n_av - 1)[off:off + tq, :] if n_av
                else jnp.ones((tq, 1), jnp.float32))
        ag_t = af_t * g32[off:off + tq, :]
        de = jax.lax.dot_general(
            pt_t, qs_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            ag_t, bFv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = en * (de - rho)
        dq_t = scale * jax.lax.dot_general(
            ds, k32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, pl.ds(off, tq), :] = dq_t.astype(dq_ref.dtype)
        dkacc[...] = dkacc[...] + scale * jax.lax.dot_general(
            ds, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_ref[0, :, :] = dkacc[...].astype(dk_ref.dtype)


def _pad_rows(x, rows):
    if x.shape[-2] == rows:
        return x
    return jnp.pad(x, ((0, 0), (0, rows - x.shape[-2]), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=("scale", "iters", "final_row", "interpret", "want_vecs"),
)
def _stream_fwd_impl(q, k, v, scale, iters, final_row, interpret,
                     want_vecs=False):
    b, h, n, d = q.shape
    m = k.shape[2]
    r = b * h
    tq, n_pad = _tile(n)
    m_pad = _round_up(m, 128)
    qr = _pad_rows(q.reshape(r, n, d), n_pad)
    kr = _pad_rows(k.reshape(r, m, d), m_pad)
    vr = _pad_rows(v.reshape(r, m, d), m_pad)
    n_av = _n_avecs(iters, final_row)
    a_cols = 1 + n_av  # lse + a vectors
    kernel = functools.partial(
        _stream_fwd_kernel, scale=scale, n=n, m=m, n_pad=n_pad, m_pad=m_pad,
        tq=tq, iters=iters, final_row=final_row, want_vecs=want_vecs,
    )
    spec_q = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, m_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [spec_q]
    out_shape = [jax.ShapeDtypeStruct((r, n_pad, d), v.dtype)]
    if want_vecs:
        # residuals are ROW-major stacks — lane dim = N/M (a [r, Np, 4]
        # column layout lane-pads 4 → 128: 32× HBM, OOMed Twins s1)
        out_specs += [
            pl.BlockSpec((1, a_cols, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, iters, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((r, a_cols, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((r, iters, m_pad), jnp.float32),
        ]
    res = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=tuple(out_specs) if want_vecs else out_specs[0],
        out_shape=tuple(out_shape) if want_vecs else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((1, m_pad), jnp.float32),        # bcur
            pltpu.VMEM((n_pad, a_cols), jnp.float32),   # avs (column form)
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * (iters + 2) * 2 * n_pad * m_pad * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=r * (iters + 2) * n_pad * m_pad,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(qr, kr, vr)
    if want_vecs:
        o, av, bv = res
        return o[:, :n].reshape(b, h, n, d), av, bv
    return res[:, :n].reshape(b, h, n, d), None, None


@functools.partial(
    jax.jit, static_argnames=("scale", "iters", "final_row", "interpret")
)
def _stream_bwd_impl(q, k, v, g, av, bv, scale, iters, final_row,
                     interpret):
    b, h, n, d = q.shape
    m = k.shape[2]
    r = b * h
    tq, n_pad = _tile(n)
    m_pad = _round_up(m, 128)
    qr = _pad_rows(q.reshape(r, n, d), n_pad)
    kr = _pad_rows(k.reshape(r, m, d), m_pad)
    vr = _pad_rows(v.reshape(r, m, d), m_pad)
    gr = _pad_rows(g.reshape(r, n, d), n_pad)
    n_av = _n_avecs(iters, final_row)
    a_cols = 1 + n_av
    kernel = functools.partial(
        _stream_bwd_kernel, scale=scale, n=n, m=m, n_pad=n_pad, m_pad=m_pad,
        tq=tq, iters=iters, final_row=final_row,
    )
    spec_q = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, m_pad, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_av = pl.BlockSpec((1, a_cols, n_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_bv = pl.BlockSpec((1, iters, m_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(r,),
        in_specs=[spec_q, spec_k, spec_k, spec_q, spec_av, spec_bv],
        out_specs=(spec_q, spec_k, spec_k),
        out_shape=(
            jax.ShapeDtypeStruct((r, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((r, m_pad, d), k.dtype),
            jax.ShapeDtypeStruct((r, m_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, m_pad), jnp.float32),        # bcur
            pltpu.VMEM((1, m_pad), jnp.float32),        # dcol
            pltpu.VMEM((n_pad, 8), jnp.float32),        # rank-1 row factors
            pltpu.VMEM((8, m_pad), jnp.float32),        # rank-1 col factors
            pltpu.VMEM((m_pad, d), jnp.float32),        # tacc
            pltpu.VMEM((m_pad, d), jnp.float32),        # dkacc
            pltpu.VMEM((n_pad, a_cols), jnp.float32),   # avs (column form)
            pltpu.VMEM((n_pad, 1), jnp.float32),        # goacc
        ],
        cost_estimate=pl.CostEstimate(
            flops=r * (iters + 3) * 4 * n_pad * m_pad * d,
            bytes_accessed=3 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=r * (iters + 3) * n_pad * m_pad,
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(qr, kr, vr, gr, av, bv)
    return (
        dq[:, :n].reshape(b, h, n, d),
        dk[:, :m].reshape(b, h, m, d),
        dv[:, :m].reshape(b, h, m, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def streaming_attention(q, k, v, scale, sinkhorn_iters=3,
                        final_row_norm=True, interpret=False):
    """Sinkhorn attention without materializing the N×M matrix anywhere.

    ``q [B, H, N, D]``, ``k/v [B, H, M, D]`` → ``[B, H, N, D]``; equals
    ``sinkhorn_attention(scale·q·kᵀ) @ v`` (softmax + the reference's
    alternating renormalizations, ref utils.py:1025-1037 / :218-224) with
    zero N² HBM traffic — built for CvT stage-1 (N=3136, ref cvt.py:60-102)
    and any future giant-N robust stage."""
    o, _, _ = _stream_fwd_impl(q, k, v, scale, sinkhorn_iters,
                               final_row_norm, interpret, want_vecs=False)
    return o


def _streaming_fwd(q, k, v, scale, sinkhorn_iters, final_row_norm, interpret):
    o, av, bv = _stream_fwd_impl(q, k, v, scale, sinkhorn_iters,
                                 final_row_norm, interpret, want_vecs=True)
    # o is NOT a residual: the backward recomputes go = rowsum(g ⊙ o) on
    # the MXU in its first sweep, saving an [r, Np, D] pinned+padded copy
    return o, (q, k, v, av, bv)


def _streaming_bwd(scale, sinkhorn_iters, final_row_norm, interpret, res, g):
    q, k, v, av, bv = res
    return _stream_bwd_impl(q, k, v, g, av, bv, scale, sinkhorn_iters,
                            final_row_norm, interpret)


streaming_attention.defvjp(_streaming_fwd, _streaming_bwd)


def streaming_supported(b: int, h: int, n: int, m: int, d: int) -> bool:
    """Shape gate. The kernel is built for the giant-N regime the resident
    kernels refuse (N_pad > 640); the caller applies that policy — this
    gate only checks the kernel's own VMEM feasibility."""
    if n < 1 or m < 1:
        return False
    tq, n_pad = _tile(n)
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)
    resident = (4 * n_pad + 2 * m_pad) * d_pad * 4 + 2 * m_pad * d_pad * 4
    tiles = 4 * tq * m_pad * 4
    stacks = n_pad * 128 * 4 + 8 * m_pad * 4 + n_pad * 128 * 4
    return resident + tiles + stacks <= int(0.85 * _STREAM_VMEM_LIMIT)
