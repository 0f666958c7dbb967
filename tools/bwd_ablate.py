"""Ablation probe for the robust backward kernel: times a 12-deep in-jit
chain of the packed BACKWARD pallas call with pieces of the reverse-chain
math disabled, to locate where the ~75 ms/step robust-backward cost lives.

The ablated variants compute WRONG gradients — this is a cost probe, not a
correctness path. Usage: python tools/bwd_ablate.py MODE [batch] [steps]

Modes:
  full     the real backward math
  noloop   skip the reverse Sinkhorn loop entirely (keep direct terms)
  nomv     reverse loop with the 7 A·x / Aᵀ·x matvec reductions replaced by
           constant vectors (keeps the tiny vector ops + rank-1 terms)
  norank1  full loop but skip the rank-1 concat + K-dim MXU matmul
  notrans  full loop but vectors kept row-major ([K,1,N]) throughout — no
           column↔row reshapes (measures the relayout/transpose cost)
  opt[S]   lean reverse chain (row-major, precomputed -b², divide-free),
           optionally split into S independent K-slice chains whose serial
           tiny-op latencies can overlap (opt, opt2, opt4)
  plain    the non-robust backward (baseline floor)
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from noise_robust_vit_tpu.ops.pallas.sinkhorn_attention import (
    _round_up,
    _compiler_params,
)

H, D, N = 12, 64, 196
DEPTH = 12
ITERS, FINAL_ROW = 4, False


def bwd_math(q, k, v, g, vecs, *, scale, n, mode):
    kb, n_pad, _ = q.shape
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    BATCHED_NN = (((2,), (2,)), ((0,), (0,)))
    BATCHED_AB = (((2,), (1,)), ((0,), (0,)))
    BATCHED_AT = (((1,), (1,)), ((0,), (0,)))
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    s = dot(qf, kf, dimension_numbers=BATCHED_NN) * scale
    col2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    mask2 = ((row2 < n) & (col2 < n))[None]
    lse = vecs[:, vecs.shape[1] - 1][:, :, None]
    attn = jnp.where(mask2, jnp.exp(s - lse), 0.0)

    if mode == "plain":
        dv = dot(attn, gf, dimension_numbers=BATCHED_AT)
        dA = dot(gf, vf, dimension_numbers=BATCHED_NN)
        ds = attn * (dA - jnp.sum(dA * attn, axis=-1, keepdims=True))
        dq = scale * dot(ds, kf, dimension_numbers=BATCHED_AB)
        dk = scale * dot(ds, qf, dimension_numbers=BATCHED_AT)
        return dq, dk, dv

    ones_col = jnp.ones((kb, n_pad, 1), jnp.float32)
    ka = max(ITERS - 1, 0) + int(FINAL_ROW)
    as_ = [ones_col] + [vecs[:, j][:, :, None] for j in range(ka)]
    bs = [ones_col] + [vecs[:, ka + j][:, :, None] for j in range(ITERS)]
    a_fin, b_fin = as_[-1], bs[-1]

    bv = b_fin * vf
    o_over_a = dot(attn, bv, dimension_numbers=BATCHED_AB)
    ag = a_fin * gf
    t1 = dot(attn, ag, dimension_numbers=BATCHED_AT)
    dv = b_fin * t1
    dA = dot(ag, bv, dimension_numbers=BATCHED_NN)
    da = jnp.sum(gf * o_over_a, axis=-1, keepdims=True)
    db = jnp.sum(t1 * vf, axis=-1, keepdims=True)
    row_direct = a_fin * da

    def as_row(vec_col):
        return vec_col.reshape(kb, 1, n_pad)

    def mv(mat_T, vec_col):
        if mode == "nomv":
            return (jnp.zeros((kb, 1, n_pad), jnp.float32) + 0.5) if mat_T \
                else ones_col * 0.5
        if mat_T:
            return jnp.sum(attn * vec_col, axis=-2, keepdims=True)
        return jnp.sum(attn * as_row(vec_col), axis=-1, keepdims=True)

    terms = []
    svec = jnp.zeros((kb, n_pad, 1), jnp.float32)
    if mode != "noloop":
        for t in range(ITERS - 1, -1, -1):
            a_t = as_[t]
            b_t = bs[t + 1]
            dc = -db * (b_t * b_t)
            m_dc = mv(False, dc)
            terms.append((a_t, dc))
            svec = svec + a_t * m_dc
            if t == 0:
                break
            da = da + m_dc
            dr = -da * a_t * a_t
            terms.append((dr, bs[t]))
            svec = svec + dr / a_t
            db = mv(True, dr).reshape(kb, n_pad, 1)
            da = jnp.zeros_like(da)

    row_term = row_direct + svec
    inner = dA - row_term
    if terms and mode != "norank1":
        u_mat = jnp.concatenate([u for u, _ in terms], axis=2)
        v_mat = jnp.concatenate([vv for _, vv in terms], axis=2)
        inner = inner + dot(u_mat, v_mat, dimension_numbers=BATCHED_NN)
    ds = attn * inner
    dq = scale * dot(ds, kf, dimension_numbers=BATCHED_AB)
    dk = scale * dot(ds, qf, dimension_numbers=BATCHED_AT)
    return dq, dk, dv


def bwd_math_rowmajor(q, k, v, g, vecs, *, scale, n):
    """'notrans' variant: every chain vector stays ROW-major [K, 1, N];
    column uses go through a single relayout only where the math forces it."""
    kb, n_pad, _ = q.shape
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    BATCHED_NN = (((2,), (2,)), ((0,), (0,)))
    BATCHED_AB = (((2,), (1,)), ((0,), (0,)))
    BATCHED_AT = (((1,), (1,)), ((0,), (0,)))
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    s = dot(qf, kf, dimension_numbers=BATCHED_NN) * scale
    col2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    mask2 = ((row2 < n) & (col2 < n))[None]
    lse = vecs[:, vecs.shape[1] - 1][:, :, None]
    attn = jnp.where(mask2, jnp.exp(s - lse), 0.0)

    ones_row = jnp.ones((kb, 1, n_pad), jnp.float32)
    ka = max(ITERS - 1, 0) + int(FINAL_ROW)
    as_ = [ones_row] + [vecs[:, j][:, None, :] for j in range(ka)]
    bs = [ones_row] + [vecs[:, ka + j][:, None, :] for j in range(ITERS)]
    a_fin, b_fin = as_[-1], bs[-1]

    # column-broadcast uses of a_fin/b_fin on [K,N,D] operands: relayout ONCE
    a_fin_c = a_fin.reshape(kb, n_pad, 1)
    b_fin_c = b_fin.reshape(kb, n_pad, 1)
    bv = b_fin_c * vf
    o_over_a = dot(attn, bv, dimension_numbers=BATCHED_AB)
    ag = a_fin_c * gf
    t1 = dot(attn, ag, dimension_numbers=BATCHED_AT)
    dv = b_fin_c * t1
    dA = dot(ag, bv, dimension_numbers=BATCHED_NN)
    da = jnp.sum(gf * o_over_a, axis=-1, keepdims=True).reshape(kb, 1, n_pad)
    db = jnp.sum(t1 * vf, axis=-1, keepdims=True).reshape(kb, 1, n_pad)
    row_direct = a_fin * da  # row-major

    def mv_row(mat_T, vec_row):
        # A·x (row-reduce) or Aᵀ·x (col-reduce), vec ROW-major in and out:
        # A·x needs x broadcast over lanes → one relayout inside
        if mat_T:
            return jnp.sum(attn * vec_row.reshape(kb, n_pad, 1),
                           axis=-2, keepdims=True)
        return jnp.sum(attn * vec_row, axis=-1,
                       keepdims=True).reshape(kb, 1, n_pad)

    terms = []
    svec = jnp.zeros((kb, 1, n_pad), jnp.float32)
    for t in range(ITERS - 1, -1, -1):
        a_t = as_[t]
        b_t = bs[t + 1]
        dc = -db * (b_t * b_t)
        m_dc = mv_row(False, dc)
        terms.append((a_t, dc))
        svec = svec + a_t * m_dc
        if t == 0:
            break
        da = da + m_dc
        dr = -da * a_t * a_t
        terms.append((dr, bs[t]))
        svec = svec + dr / a_t
        db = mv_row(True, dr)
        da = jnp.zeros_like(da)

    row_term = (row_direct + svec).reshape(kb, n_pad, 1)
    u_mat = jnp.concatenate([u for u, _ in terms], axis=1)  # [K, T, N]
    v_mat = jnp.concatenate([vv for _, vv in terms], axis=1)
    inner = (dA - row_term) + dot(
        u_mat, v_mat, dimension_numbers=(((1,), (1,)), ((0,), (0,)))
    )
    ds = attn * inner
    dq = scale * dot(ds, kf, dimension_numbers=BATCHED_AB)
    dk = scale * dot(ds, qf, dimension_numbers=BATCHED_AT)
    return dq, dk, dv


def bwd_math_opt(q, k, v, g, vecs, *, scale, n, split=1):
    """Lean reverse chain: row-major vectors, precomputed -b², divide-free
    updates, no da zeroing dance; ``split`` runs that chain as `split`
    INDEPENDENT K-slice chains so their serial tiny-op latencies can
    overlap in Mosaic's scheduler."""
    kb, n_pad, _ = q.shape
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    BATCHED_NN = (((2,), (2,)), ((0,), (0,)))
    BATCHED_AB = (((2,), (1,)), ((0,), (0,)))
    BATCHED_AT = (((1,), (1,)), ((0,), (0,)))
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    s = dot(qf, kf, dimension_numbers=BATCHED_NN) * scale
    col2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    mask2 = ((row2 < n) & (col2 < n))[None]
    lse = vecs[:, vecs.shape[1] - 1][:, :, None]
    attn = jnp.where(mask2, jnp.exp(s - lse), 0.0)

    ka = max(ITERS - 1, 0) + int(FINAL_ROW)
    a_rows = [vecs[:, j][:, None, :] for j in range(ka)]
    b_rows = [vecs[:, ka + j][:, None, :] for j in range(ITERS)]
    ones_row = jnp.ones((kb, 1, n_pad), jnp.float32)
    as_r = [ones_row] + a_rows
    bs_r = [ones_row] + b_rows
    a_fin_c = as_r[-1].reshape(kb, n_pad, 1)
    b_fin_c = bs_r[-1].reshape(kb, n_pad, 1)
    # precompute -b², batched over the whole stack in ONE op
    nb2_stack = -(vecs[:, ka:ka + ITERS] * vecs[:, ka:ka + ITERS])
    nb2 = {ITERS - j: nb2_stack[:, j][:, None, :] for j in range(ITERS)}
    nb2[0] = -ones_row  # b_0 ≡ 1

    bv = b_fin_c * vf
    o_over_a = dot(attn, bv, dimension_numbers=BATCHED_AB)
    ag = a_fin_c * gf
    t1 = dot(attn, ag, dimension_numbers=BATCHED_AT)
    dv = b_fin_c * t1
    dA = dot(ag, bv, dimension_numbers=BATCHED_NN)
    da0 = jnp.sum(gf * o_over_a, axis=-1, keepdims=True)  # [K,N,1]
    db0 = jnp.sum(t1 * vf, axis=-1, keepdims=True).reshape(kb, 1, n_pad)
    row_direct = a_fin_c * da0

    def chain(sl):
        at = attn[sl]
        da_c = da0[sl]  # [k,N,1] — only live at t = ITERS-1
        db = db0[sl]
        svec = None
        terms = []
        for t in range(ITERS - 1, -1, -1):
            a_t = as_r[t][sl]
            dc = db * nb2[t + 1][sl]  # row [k,1,N]
            m_dc = jnp.sum(at * dc, axis=-1, keepdims=True)  # A·dc col
            terms.append((a_t.reshape(dc.shape[0], n_pad, 1),
                          dc.reshape(dc.shape[0], n_pad, 1)))
            a_t_c = a_t.reshape(dc.shape[0], n_pad, 1)
            contrib = a_t_c * m_dc
            svec = contrib if svec is None else svec + contrib
            if t == 0:
                break
            da_eff = (da_c + m_dc) if t == ITERS - 1 else m_dc
            tmp = da_eff * a_t_c           # = da·a_t
            svec = svec - tmp              # dr/a_t = -da·a_t
            dr = -(tmp * a_t_c)            # [k,N,1] column
            db = jnp.sum(at * dr, axis=-2, keepdims=True)  # Aᵀ·dr row
        u_mat = jnp.concatenate([u for u, _ in terms], axis=2)
        v_mat = jnp.concatenate([vv for _, vv in terms], axis=2)
        return svec, dot(u_mat, v_mat, dimension_numbers=BATCHED_NN)

    if split == 1:
        svec, rank1 = chain(slice(None))
    else:
        step = kb // split
        parts = [chain(slice(i * step, (i + 1) * step)) for i in range(split)]
        svec = jnp.concatenate([p[0] for p in parts], axis=0)
        rank1 = jnp.concatenate([p[1] for p in parts], axis=0)

    inner = (dA - (row_direct + svec)) + rank1
    ds = attn * inner
    dq = scale * dot(ds, kf, dimension_numbers=BATCHED_AB)
    dk = scale * dot(ds, qf, dimension_numbers=BATCHED_AT)
    return dq, dk, dv


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_pad = _round_up(N, 128)
    bh = batch * H
    G = 8
    n_vecs = max(ITERS - 1, 0) + int(FINAL_ROW) + ITERS + 1

    def kernel(q_ref, k_ref, v_ref, g_ref, vec_ref, dq_ref, dk_ref, dv_ref):
        if mode == "real":
            # the ACTUAL production math (sinkhorn_attention._bwd_math_batched)
            # in this harness's [K, n_pad, D] layout — separates "the math is
            # slow" from "the packed kernel's pack/unpack is slow"
            from noise_robust_vit_tpu.ops.pallas.sinkhorn_attention import (
                _bwd_math_batched,
            )

            real_fn = functools.partial(
                _bwd_math_batched, robust=True, iters=ITERS,
                final_row=FINAL_ROW,
            )

            def run_real(q, k, v, g, vecs, *, scale, n):
                return real_fn(q, k, v, g, scale=scale, n=n,
                               vecs=vecs[:, :n_vecs])

            fn = run_real
        elif mode == "notrans":
            fn = bwd_math_rowmajor
        elif mode.startswith("opt"):
            fn = functools.partial(
                bwd_math_opt, split=int(mode[3:] or 1)
            )
        else:
            fn = functools.partial(bwd_math, mode=mode)
        dq, dk, dv = fn(
            q_ref[...], k_ref[...], v_ref[...], g_ref[...], vec_ref[...],
            scale=D**-0.5, n=N,
        )
        dq_ref[...] = dq.astype(dq_ref.dtype)
        dk_ref[...] = dk.astype(dk_ref.dtype)
        dv_ref[...] = dv.astype(dv_ref.dtype)

    spec = pl.BlockSpec((G, n_pad, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    spec_vec = pl.BlockSpec((G, 8, n_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(q, k, v, g, vecs):
        call = pl.pallas_call(
            kernel,
            grid=(bh // G,),
            in_specs=[spec, spec, spec, spec, spec_vec],
            out_specs=(spec, spec, spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((bh, n_pad, D), q.dtype)
                for _ in range(3)
            ),
            compiler_params=_compiler_params(),
        )
        out = q
        for _ in range(DEPTH):
            dq, dk, dv = call(out, k, v, g, vecs)
            out = (dq + dk + dv).astype(q.dtype)
        return jnp.sum(out.astype(jnp.float32))

    rng = jax.random.PRNGKey(0)
    q, k, v, g = (
        jax.random.normal(jax.random.fold_in(rng, i), (bh, n_pad, D),
                          jnp.bfloat16)
        for i in range(4)
    )
    vecs = jnp.abs(
        jax.random.normal(jax.random.fold_in(rng, 9), (bh, 8, n_pad))
    ) + 0.5

    r = run(q, k, v, g, vecs)
    float(jax.device_get(r))
    t0 = time.perf_counter()
    for _ in range(steps):
        r = run(q, k, v, g, vecs)
    float(jax.device_get(r))
    dt = (time.perf_counter() - t0) / steps * 1000
    print(json.dumps({"mode": mode, "ms_bwd_chain12": round(dt, 2)}))


if __name__ == "__main__":
    main()
