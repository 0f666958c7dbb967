"""Sinkhorn (doubly-stochastic) attention normalization — the core "robust" op.

The reference implements this twice with slightly different iteration schedules
(ref: vit_pytorch_robust/utils.py:1025-1037 ``SinkhornAttention`` — softmax then
3 alternating row/col renormalizations plus a final row normalization; and
utils.py:218-224 — softmax then 4 alternating row/col renormalizations with no
final row pass). Both variants are exposed here, parameterized.

TPU notes: the column normalization (sum over the second-to-last axis) breaks
flash attention's streaming-softmax invariant, so the fused kernel
(`ops/pallas/sinkhorn_attention.py`) materializes the full attention matrix
per (batch, head) block in VMEM — fine for the sequence lengths the reference
uses (N <= ~3k globally, N <= 256 per window for hierarchical models).
This file is the pure-JAX reference implementation; XLA fuses the row/col
reductions into a handful of VPU passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sinkhorn_scalings",
    "sinkhorn_normalize",
    "sinkhorn_attention",
    "robust_softmax",
]


def sinkhorn_scalings(
    attn: jax.Array,
    num_iters: int = 3,
    final_row_norm: bool = True,
    assume_row_stochastic: bool = False,
    constrain=None,
) -> tuple[jax.Array, jax.Array]:
    """Sinkhorn row/column scaling vectors — the O(N·iters) form.

    Every alternating row/col renormalization of a non-negative matrix keeps
    it in the form ``diag(a) · attn · diag(b)``; the reference's matrix
    rewrites (utils.py:1025-1037) therefore reduce to the classic
    Sinkhorn-Knopp vector iteration
        a ← 1 / (attn @ b),   b ← 1 / (attnᵀ @ a),
    which is what this returns: ``(a [..., N], b [..., M])`` such that
    ``diag(a) attn diag(b)`` equals the reference's result exactly (same
    fixed point, same iteration count). The matvecs run on the MXU and the
    N×N matrix is touched once — the reason the fused kernel beats the
    rewrite form on TPU (no N² intermediates written per iteration).

    All-zero (fully masked/padded) rows and columns get a scaling of 1 and
    stay zero.
    """

    def _recip(x):
        # Masked (exact-zero) sums map to 1 via a double-where so the vjp
        # stays NaN-free. Live sums are clamped at 1e-8: during training,
        # attention can sharpen until some key receives ~0 total mass, and
        # the scaling vector 1/colsum overflows f32 (the reference's matrix
        # rewrites are ratio-stable; the vector form must clamp). The clamp
        # is inactive at any healthy attention mass, preserving parity.
        safe = jnp.where(x == 0.0, 1.0, jnp.maximum(x, 1e-8))
        return jnp.where(x == 0.0, 1.0, 1.0 / safe)

    cons = constrain or (lambda t: t)
    b = jnp.ones(attn.shape[:-2] + (attn.shape[-1],), attn.dtype)
    a = jnp.ones(attn.shape[:-2] + (attn.shape[-2],), attn.dtype)
    for i in range(num_iters):
        if i == 0 and assume_row_stochastic:
            # ``attn`` is a row softmax: rowsum ≡ 1 as a function of the
            # LOGITS (value and gradient — d(rowsum∘softmax) = 0), so the
            # first row normalization is exactly the identity. Only set this
            # flag when differentiation happens through the softmax.
            pass
        else:
            a = cons(_recip(jnp.einsum("...nm,...m->...n", attn, b)))
        b = cons(_recip(jnp.einsum("...nm,...n->...m", attn, a)))
    if final_row_norm:
        a = cons(_recip(jnp.einsum("...nm,...m->...n", attn, b)))
    return a, b


def sinkhorn_normalize(
    attn: jax.Array,
    num_iters: int = 3,
    final_row_norm: bool = True,
    eps: float = 0.0,
) -> jax.Array:
    """Alternating row/column renormalization of a non-negative matrix.

    Row axis is ``-2`` (queries), column axis is ``-1`` (keys): a "row
    normalization" divides by the sum over the last axis so each query's
    attention distribution sums to 1; a "column normalization" divides by the
    sum over ``-2`` so each key's received mass sums to 1.

    Args:
      attn: non-negative attention weights ``[..., N, M]`` (e.g. post-softmax).
      num_iters: number of (row, col) iteration pairs.
      final_row_norm: apply one extra row normalization at the end (the
        ``SinkhornAttention`` schedule; the vendored-MHA schedule omits it).
      eps: optional denominator epsilon. With the default 0.0 an all-zero
        row/column (fully-masked) divides by a ``where``-guarded denominator
        (0 → 1, so zeros stay zeros) and every live entry sees the exact
        reference arithmetic.

    Returns:
      Approximately doubly-stochastic weights, same shape/dtype as ``attn``.
    """

    if eps:
        # literal rewrite form with an epsilon guard (kept for reference/
        # debugging; the eps perturbs the arithmetic slightly)
        def _div(x, axis):
            return x / (jnp.sum(x, axis=axis, keepdims=True) + eps)

        for _ in range(num_iters):
            attn = _div(attn, -1)
            attn = _div(attn, -2)
        if final_row_norm:
            attn = _div(attn, -1)
        return attn
    a, b = sinkhorn_scalings(attn, num_iters=num_iters, final_row_norm=final_row_norm)
    return attn * a[..., :, None] * b[..., None, :]


def sinkhorn_attention(
    logits: jax.Array,
    axis: int = -1,
    num_iters: int = 3,
    final_row_norm: bool = True,
) -> jax.Array:
    """softmax followed by Sinkhorn renormalization (ref utils.py:1025-1037).

    Computed in float32 regardless of input dtype (softmax + repeated division
    are precision-sensitive); cast back to the input dtype at the end.

    On TPU, square (self-attention) logits take the fused Pallas kernel
    (`ops/pallas/sinkhorn_softmax.py`): one VMEM residency of the N² matrix
    for the whole softmax+Sinkhorn chain instead of XLA's per-reduction HBM
    round trips — the robust fast path for the models that transform the
    attention matrix between normalization and the value matmul (CaiT,
    DeepViT, …) and therefore can't use the fused q/k/v kernels. NOT jitted
    here on purpose: the dispatch reads a process-global flag
    (`ops.attention.set_use_pallas`) that a jit cache would freeze.
    """
    import os

    dtype = logits.dtype
    if axis in (-1, logits.ndim - 1) and not os.environ.get(
        "NRV_NO_SINKHORN_SOFTMAX"
    ):
        # lazy import: ops.attention imports this module at load time
        from .attention import pallas_dispatch

        if pallas_dispatch(True, logits.shape[-1]):
            from .pallas.sinkhorn_softmax import (
                sinkhorn_softmax,
                sinkhorn_softmax_rect,
                sinkhorn_softmax_rect_supported,
                sinkhorn_softmax_supported,
            )

            if sinkhorn_softmax_supported(logits.shape, num_iters):
                interpret = jax.default_backend() != "tpu"
                return sinkhorn_softmax(
                    logits, num_iters, final_row_norm, interpret
                )
            if not os.environ.get("NRV_NO_SINKHORN_RECT") and (
                sinkhorn_softmax_rect_supported(logits.shape, num_iters)
            ):
                # rectangular cross-attention (CvT's stride-reduced keys,
                # ref cvt.py:70-102; Twins' subsampled GlobalAttention,
                # ref twins_svt.py:122-153)
                interpret = jax.default_backend() != "tpu"
                return sinkhorn_softmax_rect(
                    logits, num_iters, final_row_norm, interpret
                )
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=axis)
    attn = sinkhorn_normalize(attn, num_iters=num_iters, final_row_norm=final_row_norm)
    return attn.astype(dtype)


def talking_heads_robust_softmax(
    dots: jax.Array,
    mix_pre: jax.Array,
    mix_post: jax.Array,
    robust: bool = False,
) -> jax.Array:
    """CaiT's talking-heads sandwich (ref cait.py:110-119): pre-softmax head
    mix → (softmax | Sinkhorn) → post-softmax head mix, on ``dots
    [B, H, N, N]`` with ``mix_* [H, H]``.

    The robust square case takes the fused Pallas kernel
    (`ops/pallas/talking_heads.py`): the two H-contraction mixes are pure
    HBM bandwidth either side of the normalization kernel's boundary, and
    fusing the whole sandwich into one VMEM residency removes ~12 of the
    ~17 per-layer N² HBM passes. Callers with attention dropout BETWEEN the
    normalization and the post-mix must use the unfused path (the fused
    kernel has no dropout point)."""
    import os

    if robust and not os.environ.get("NRV_NO_TALKING_HEADS"):
        from .attention import pallas_dispatch

        if pallas_dispatch(True, dots.shape[-1]):
            from .pallas.talking_heads import (
                talking_heads_sinkhorn,
                talking_heads_supported,
            )

            if talking_heads_supported(dots.shape, 3):
                interpret = jax.default_backend() != "tpu"
                return talking_heads_sinkhorn(
                    dots, mix_pre.astype(dots.dtype),
                    mix_post.astype(dots.dtype), 3, True, interpret,
                )
    dots = jnp.einsum("bhij,hg->bgij", dots, mix_pre.astype(dots.dtype))
    attn = robust_softmax(dots, robust=robust)
    return jnp.einsum("bhij,hg->bgij", attn, mix_post.astype(attn.dtype))


def robust_softmax(logits: jax.Array, robust: bool = False, axis: int = -1) -> jax.Array:
    """Plain softmax, or the Sinkhorn-normalized variant when ``robust``.

    This is the schedule used inline by the robustified models
    (ref swin.py:239-244, levit.py:271-278, cait.py:89-92,
    simple_vit.py:56-59): 3 iterations + final row normalization.
    """
    if not robust:
        return jax.nn.softmax(logits, axis=axis)
    return sinkhorn_attention(logits, axis=axis, num_iters=3, final_row_norm=True)


if __name__ == "__main__":
    # smoke check mirroring the reference's (ref utils.py:1208-1213):
    # rows sum to 1 exactly, columns approximately
    key = jax.random.PRNGKey(0)
    attn = sinkhorn_attention(jax.random.normal(key, (2, 16, 16)))
    print("row sums:", jnp.sum(attn, axis=-1)[0, :4])
    print("col sums:", jnp.sum(attn, axis=-2)[0, :4])
