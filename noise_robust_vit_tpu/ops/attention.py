"""Multi-head attention compute ops (pure-JAX path + Pallas dispatch).

This is the L0 attention surface every model in the zoo builds on
(ref vit_pytorch_robust/utils.py:207-232 ``_scaled_dot_product_attention`` and
the per-model inline attentions, e.g. simple_vit.py:64-76). Two normalization
modes:

  * ``robust=False`` — plain row softmax.
  * ``robust=True``  — softmax + Sinkhorn doubly-stochastic renormalization.

Design: the hot path is expressed as a single function over ``[B, H, N, D]``
tensors so XLA maps both GEMMs onto the MXU and fuses the normalizations; when
running on TPU with supported shapes the fused Pallas kernel
(`ops/pallas/sinkhorn_attention.py`) is used instead, which keeps the N×N
attention matrix in VMEM and never round-trips it through HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..parallel.tp import constrain_activation
from .sinkhorn import sinkhorn_normalize, sinkhorn_scalings

__all__ = [
    "dot_product_attention",
    "attention_weights",
    "packed_attention",
    "packed_dispatch",
    "set_use_pallas",
    "use_pallas_default",
]

_USE_PALLAS: bool | None = None  # None = auto (TPU only)


def set_use_pallas(value: bool | None) -> None:
    """Force (True/False) or restore auto (None) Pallas kernel dispatch."""
    global _USE_PALLAS
    _USE_PALLAS = value


def use_pallas_default() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never fails in practice
        return False


def pallas_dispatch(robust: bool, n: int | None = None) -> bool:
    """Dispatch policy for the GLOBAL fused attention kernel: auto uses it for
    only for the Sinkhorn path. For PLAIN softmax the fused kernel wins in
    isolation (v5e, B=256 H=12 N=196 D=64, fwd+bwd ×12 chain: 73ms fused vs
    103ms XLA) yet LOSES inside the full model (SimpleViT-B train step 320ms
    vs 307ms) — whole-graph XLA overlaps the attention HBM traffic with
    neighboring matmuls, which the opaque kernel boundary blocks.
    ``set_use_pallas(True/False)`` overrides for both modes."""
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    return robust and use_pallas_default()


def packed_dispatch(robust: bool, n: int, dim_head: int, heads: int,
                    batch: int) -> bool:
    """Dispatch policy for the PACKED fused kernel (`packed_attention`): the
    default in-model fast path on TPU for self-attention without mask/bias.
    Unlike the [B,H,N,D] kernel it has no host-side transpose/pad boundary
    (round-2 step anatomy: in-model XLA attention costs 145ms of a 301ms
    ViT-B step; the packed kernel replaces it without blocking XLA's
    scheduling of the surrounding GEMMs)."""
    if _USE_PALLAS is False:
        return False
    if _USE_PALLAS is True or use_pallas_default():
        from .pallas.block_attention import packed_attention_supported

        return packed_attention_supported(n, dim_head, heads, batch)
    return False


def packed_attention(qkv, heads, dim_head, *, scale=None, robust=False,
                     sinkhorn_iters=3, final_row_norm=True):
    """Fused attention over the packed ``[B, N, 3·H·D]`` qkv projection
    (q|k|v chunk order, ref simple_vit.py:66-68). Returns ``[B, N, H·D]``."""
    from .pallas.block_attention import packed_attention as _impl

    if scale is None:
        scale = dim_head**-0.5
    # forced dispatch off-TPU (set_use_pallas(True) in tests) runs the
    # kernel in interpret mode so model wiring is exercisable on CPU
    interpret = jax.default_backend() != "tpu"
    return _impl(qkv, heads, dim_head, float(scale), bool(robust),
                 int(sinkhorn_iters), bool(final_row_norm), interpret)


def biased_dispatch(robust: bool, bw: int, heads: int, n: int, d: int,
                    dv: int, num_windows: int) -> bool:
    """Dispatch policy for the BIASED fused kernel (`biased_attention`) —
    the windowed/hierarchical robust models (Swin rel-pos bias + shift mask,
    LeViT attention-bias tables). Auto-enables for the Sinkhorn path only:
    the plain-softmax windowed models stay on XLA's batched GEMMs
    (round-1 RESULTS.md: the fused window kernel lost for vanilla)."""
    if _USE_PALLAS is False or not robust:
        return False
    if _USE_PALLAS is True or use_pallas_default():
        from .pallas.biased_attention import biased_attention_supported

        return biased_attention_supported(bw, heads, n, d, dv, num_windows)
    return False


def biased_attention(q, k, v, bias, *, scale=None, robust=False,
                     sinkhorn_iters=3, final_row_norm=True, num_windows=1,
                     no_bias=False):
    """Fused attention with an additive per-(window, head) logit bias —
    ``q/k [BW, H, N, D]``, ``v [BW, H, N, DV]``, ``bias [nW, H, N, N]``
    broadcast over the batch (ref swin.py:186-244, levit.py:225-278).
    ``no_bias=True`` declares ``bias`` known-zero so the kernel skips the
    bias add and the dbias accumulation entirely (Twins local attention)."""
    from .pallas.biased_attention import biased_attention as _impl

    if scale is None:
        scale = q.shape[-1] ** -0.5
    interpret = jax.default_backend() != "tpu"
    return _impl(q, k, v, bias, float(scale), bool(robust),
                 int(sinkhorn_iters), bool(final_row_norm), int(num_windows),
                 interpret, bool(no_bias))


def streaming_dispatch(robust: bool, b: int, heads: int, n: int, m: int,
                       d: int) -> bool:
    """Dispatch policy for the STREAMING q/k/v-interface Sinkhorn kernel
    (`ops/pallas/streaming_sinkhorn.py`) — the giant-N robust regime where
    the resident logits-interface kernels refuse (N_pad > 640: CvT stage-1's
    3136×784, ref cvt.py:60-102). The matrix is recomputed per reduction on
    the MXU instead of round-tripping N² f32 through HBM per Sinkhorn pass.
    ``NRV_STREAM_ALL=1`` widens the gate to every robust q/k/v shape the
    kernel fits (A/B probing); ``NRV_NO_STREAMING=1`` opts out."""
    import os

    if _USE_PALLAS is False or not robust:
        return False
    if os.environ.get("NRV_NO_STREAMING"):
        return False
    if not (_USE_PALLAS is True or use_pallas_default()):
        return False
    from .pallas.sinkhorn_attention import _round_up
    from .pallas.streaming_sinkhorn import streaming_supported

    giant = max(_round_up(n, 128), _round_up(m, 128)) > 640
    if not (giant or os.environ.get("NRV_STREAM_ALL")):
        return False
    return streaming_supported(b, heads, n, m, d)


def streaming_attention(q, k, v, *, scale=None, sinkhorn_iters=3,
                        final_row_norm=True):
    """Fused giant-N Sinkhorn attention at the q/k/v interface — never
    materializes the N×M matrix (``q [B,H,N,D]``, ``k/v [B,H,M,D]``).
    Semantics = ``robust_softmax(scale·q·kᵀ) @ v`` (ref utils.py:1025-1037)."""
    from .pallas.streaming_sinkhorn import streaming_attention as _impl

    if scale is None:
        scale = q.shape[-1] ** -0.5
    interpret = jax.default_backend() != "tpu"
    return _impl(q, k, v, float(scale), int(sinkhorn_iters),
                 bool(final_row_norm), interpret)


def attention_weights(
    q: jax.Array,
    k: jax.Array,
    *,
    scale: float | None = None,
    bias: jax.Array | None = None,
    mask: jax.Array | None = None,
    robust: bool = False,
    sinkhorn_iters: int = 3,
    final_row_norm: bool = True,
) -> jax.Array:
    """Normalized attention weights ``[..., N, M]`` from q ``[..., N, D]``, k ``[..., M, D]``.

    ``bias`` is added to the logits (relative position bias etc.); ``mask`` is
    boolean (True = attend) and is applied as a large negative fill before the
    softmax (ref utils.py:215-216) and re-applied as a hard zero afterwards so
    masked entries cannot leak mass into Sinkhorn's column sums.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "...nd,...md->...nm", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    if robust and mask is None:
        # identical semantics to softmax + sinkhorn_normalize below, but
        # dispatched through ops/sinkhorn.py::sinkhorn_attention so the
        # fused logits/rect kernels serve the matrix-materializing callers
        # too (attention-weight dropout in train mode, CCT, CrossViT —
        # round-5 dispatch-audit fix; the masked path keeps the explicit
        # pre-fill + post-zero composition below)
        from .sinkhorn import sinkhorn_attention as _sk_attn

        return _sk_attn(
            logits, num_iters=sinkhorn_iters, final_row_norm=final_row_norm
        )
    attn = jax.nn.softmax(logits, axis=-1)
    if robust:
        if mask is not None:
            attn = jnp.where(mask, attn, 0.0)
        attn = sinkhorn_normalize(
            attn, num_iters=sinkhorn_iters, final_row_norm=final_row_norm
        )
    return attn


def dot_product_attention(
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
    use_pallas: bool | None = None,
) -> jax.Array:
    """Full attention: ``softmax(qk^T * scale [+bias][mask])`` (optionally
    Sinkhorn-renormalized) ``@ v``. Shapes ``[B, H, N, D]`` (or any leading
    batch dims). Returns the same dtype as ``v``.
    """
    if use_pallas is None:
        use_pallas = pallas_dispatch(robust, q.shape[-2])
    if use_pallas:
        from .pallas import sinkhorn_attention as _pk

        out = _pk.fused_attention(
            q,
            k,
            v,
            scale=scale,
            bias=bias,
            mask=mask,
            robust=robust,
            sinkhorn_iters=sinkhorn_iters,
            final_row_norm=final_row_norm,
        )
        if out is not None:  # kernel supports these shapes
            return out
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # TP: pin the 4D [B,H,N,M] intermediates to head sharding (no-ops
    # outside a tp_shardings_active context; leading batch dims only —
    # windowed callers pass >4D shapes which GSPMD already handles)
    _tp4 = (
        (lambda t: constrain_activation(t, "data", "model", None, None))
        if q.ndim == 4 else (lambda t: t)
    )
    _tp3 = (
        (lambda t: constrain_activation(t, "data", "model", None))
        if q.ndim == 4 else (lambda t: t)
    )
    logits = jnp.einsum(
        "...nd,...md->...nm", q, k, preferred_element_type=jnp.float32
    ) * scale
    logits = _tp4(logits)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    attn = _tp4(jax.nn.softmax(logits, axis=-1))
    if mask is not None:
        attn = jnp.where(mask, attn, 0.0)
    if robust:
        # vector-form Sinkhorn: out = a ⊙ (A0 @ (b ⊙ v)) — the N×N matrix
        # is read once per matvec instead of rewritten per iteration. With
        # no hard mask the rows are an exact softmax, so the first row
        # normalization is skipped (identity in value and gradient).
        a, b = sinkhorn_scalings(
            attn,
            num_iters=sinkhorn_iters,
            final_row_norm=final_row_norm,
            assume_row_stochastic=mask is None,
            constrain=_tp3,
        )
        v = v * b[..., :, None].astype(v.dtype)
        out = _tp4(jnp.einsum(
            "...nm,...md->...nd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ))
        return (out * a[..., :, None]).astype(v.dtype)
    return _tp4(jnp.einsum(
        "...nm,...md->...nd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )).astype(v.dtype)
