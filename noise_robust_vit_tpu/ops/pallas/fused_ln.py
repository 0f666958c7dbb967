"""Fused LayerNorm Pallas kernel — the VERDICT-r2 #9 stretch experiment.

XLA lowers LayerNorm as (at least) a reduce pass plus a normalize pass over
the [R, D] activation in HBM; this kernel does moments + normalize in ONE
VMEM-resident pass per row block (one HBM read + one write), with a
hand-derived backward that recomputes the row moments instead of storing
them. Whether the saved pass survives the opaque-kernel boundary in a full
model is exactly the round-1 plain-softmax question — this file exists to
measure it (env-gate ``NRV_FUSED_LN=1``; see RESULTS.md for the verdict).

Math (ref utils.py has no LN of its own — semantics follow flax/torch
LayerNorm over the last axis):

  fwd:  mu = mean(x), rstd = rsqrt(var(x) + eps), y = (x-mu)*rstd*g + b
  bwd:  dxhat = dy*g
        dx = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat*xhat))
        dg = sum_rows(dy * xhat),  db = sum_rows(dy)

The cross-row dg/db reductions emit per-block partials ([nblk, D]) summed by
XLA outside the kernel — nblk × D is tiny next to the activation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_layer_norm", "fused_ln_supported"]

_BLOCK_ROWS = 512
_LANE = 128


def fused_ln_supported(d: int) -> bool:
    """Lane-tiled feature dim only; callers fall back to flax LayerNorm."""
    return d % _LANE == 0 and d <= 8192


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # [BR, D]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    dxhat = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # per-block dg/db partials, padded to an 8-row sublane tile (row 0 holds
    # the partial, rows 1-7 are zero): Mosaic requires the second-minor block
    # dim to be 8-divisible or span the array, so a (1, D) block is illegal
    # on real TPU (interpret mode accepted it)
    dg_ref[...] = jnp.pad(
        jnp.sum(dy * xhat, axis=0, keepdims=True), ((0, 7), (0, 0))
    )
    db_ref[...] = jnp.pad(jnp.sum(dy, axis=0, keepdims=True), ((0, 7), (0, 0)))


def _pad_rows(x2, br):
    r = x2.shape[0]
    rp = -(-r // br) * br
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
    return x2, r, rp


def _fwd_impl(x2, g, b, eps, interpret):
    x2, r, rp = _pad_rows(x2, _BLOCK_ROWS)
    d = x2.shape[1]
    nblk = rp // _BLOCK_ROWS
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d), x2.dtype),
        interpret=interpret,
    )(x2, g[None], b[None])
    return y[:r]


def _bwd_impl(x2, g, dy2, eps, interpret):
    x2, r, rp = _pad_rows(x2, _BLOCK_ROWS)
    # padded dy rows are zero so they add nothing to the dg/db partials
    dy2, _, _ = _pad_rows(dy2, _BLOCK_ROWS)
    d = x2.shape[1]
    nblk = rp // _BLOCK_ROWS
    dx, dgp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, d), x2.dtype),
            jax.ShapeDtypeStruct((nblk * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((nblk * 8, d), jnp.float32),
        ],
        interpret=interpret,
    )(x2, g[None], dy2)
    return dx[:r], jnp.sum(dgp, axis=0), jnp.sum(dbp, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, bias, eps=1e-5, interpret=False):
    """LayerNorm over the last axis of ``x [..., D]`` (D lane-tiled);
    differentiable in x, scale, bias."""
    d = x.shape[-1]
    y = _fwd_impl(x.reshape(-1, d), scale, bias, float(eps), interpret)
    return y.reshape(x.shape)


def _fln_fwd(x, scale, bias, eps, interpret):
    return fused_layer_norm(x, scale, bias, eps, interpret), (x, scale)


def _fln_bwd(eps, interpret, res, dy):
    x, scale = res
    d = x.shape[-1]
    dx, dg, db = _bwd_impl(
        x.reshape(-1, d), scale, dy.reshape(-1, d), float(eps), interpret
    )
    return dx.reshape(x.shape), dg.astype(scale.dtype), db.astype(scale.dtype)


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)
