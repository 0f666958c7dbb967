"""Fused logits→Sinkhorn kernel vs the pure-JAX vector form (CPU interpret
mode). This is the robust fast path for the zoo models that transform the
attention matrix between the softmax and the value matmul (CaiT
talking-heads, DeepViT re-attention, …) — ref utils.py:1025-1037 semantics
via ``robust_softmax``/``sinkhorn_attention``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu.ops import set_use_pallas
from noise_robust_vit_tpu.ops.sinkhorn import (
    robust_softmax,
    sinkhorn_attention,
    sinkhorn_normalize,
)
from noise_robust_vit_tpu.ops.pallas.sinkhorn_softmax import (
    sinkhorn_softmax,
    sinkhorn_softmax_supported,
)

SCHEDULES = [(3, True), (4, False), (4, True)]


def _xla_reference(logits, iters, final_row):
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = sinkhorn_normalize(attn, num_iters=iters, final_row_norm=final_row)
    return out.astype(logits.dtype)


@pytest.mark.parametrize("schedule", SCHEDULES)
@pytest.mark.parametrize("shape", [(2, 3, 24, 24), (3, 50, 50), (4, 196, 196)])
def test_forward_matches_vector_form(schedule, shape):
    iters, final_row = schedule
    logits = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3.0
    got = sinkhorn_softmax(logits, iters, final_row, interpret=True)
    want = _xla_reference(logits, iters, final_row)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-5)
    # doubly-stochastic invariants (final row norm → rows sum to exactly 1)
    if final_row:
        np.testing.assert_allclose(np.asarray(got.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_gradients_match_vector_form(schedule):
    iters, final_row = schedule
    logits = jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), logits.shape, jnp.float32)

    def loss_kernel(s):
        return jnp.sum(sinkhorn_softmax(s, iters, final_row, True) * w)

    def loss_ref(s):
        return jnp.sum(_xla_reference(s, iters, final_row) * w)

    gk = jax.grad(loss_kernel)(logits)
    gr = jax.grad(loss_ref)(logits)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=5e-6, rtol=5e-4)


def test_bf16_roundtrip():
    logits = (jax.random.normal(jax.random.PRNGKey(3), (2, 40, 40))
              .astype(jnp.bfloat16))
    got = sinkhorn_softmax(logits, 3, True, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _xla_reference(logits, 3, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_dispatch_from_robust_softmax():
    """set_use_pallas(True) routes robust_softmax through the kernel
    (interpret mode off-TPU) with identical values; non-square falls back."""
    logits = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 20, 20))
    want = robust_softmax(logits, robust=True)
    set_use_pallas(True)
    try:
        got = robust_softmax(logits, robust=True)
        rect = sinkhorn_attention(
            jax.random.normal(jax.random.PRNGKey(5), (2, 8, 24))
        )  # non-square → XLA fallback, must not raise
    finally:
        set_use_pallas(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-5)
    assert rect.shape == (2, 8, 24)


def test_supported_gate():
    assert sinkhorn_softmax_supported((2, 3, 196, 196), 3)
    assert not sinkhorn_softmax_supported((2, 8, 24), 3)      # rectangular
    assert not sinkhorn_softmax_supported((2, 1, 197), 3)     # rectangular
    assert not sinkhorn_softmax_supported((2, 2048, 2048), 3)  # too big
    assert not sinkhorn_softmax_supported((196, 196), 0)      # no iters


# --- rectangular kernel (round 4: CvT / Twins-global cross-attention) -----

from noise_robust_vit_tpu.ops.pallas.sinkhorn_softmax import (  # noqa: E402
    sinkhorn_softmax_rect,
    sinkhorn_softmax_rect_supported,
)

RECT_SHAPES = [(2, 2, 28, 12), (3, 21, 49), (2, 49, 196)]


@pytest.mark.parametrize("schedule", SCHEDULES)
@pytest.mark.parametrize("shape", RECT_SHAPES)
def test_rect_forward_matches_vector_form(schedule, shape):
    iters, final_row = schedule
    logits = jax.random.normal(jax.random.PRNGKey(6), shape, jnp.float32) * 3.0
    got = sinkhorn_softmax_rect(logits, iters, final_row, interpret=True)
    want = _xla_reference(logits, iters, final_row)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-5)
    if final_row:
        np.testing.assert_allclose(np.asarray(got.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.parametrize("schedule", SCHEDULES)
@pytest.mark.parametrize("shape", [(3, 28, 12), (2, 12, 28)])
def test_rect_gradients_match_vector_form(schedule, shape):
    """Both orientations (R > C and R < C)."""
    iters, final_row = schedule
    logits = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(8), logits.shape, jnp.float32)

    def loss_kernel(s):
        return jnp.sum(sinkhorn_softmax_rect(s, iters, final_row, True) * w)

    def loss_ref(s):
        return jnp.sum(_xla_reference(s, iters, final_row) * w)

    gk = jax.grad(loss_kernel)(logits)
    gr = jax.grad(loss_ref)(logits)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=5e-6, rtol=5e-4)


def test_rect_dispatch_from_robust_softmax():
    """Rectangular logits route through the rect kernel via robust_softmax
    when pallas is forced on; values match the vector form; the env opt-out
    restores the XLA path."""
    import os

    logits = jax.random.normal(jax.random.PRNGKey(9), (2, 3, 24, 12)) * 2.0
    want = robust_softmax(logits, robust=True)
    set_use_pallas(True)
    try:
        got = robust_softmax(logits, robust=True)
        os.environ["NRV_NO_SINKHORN_RECT"] = "1"
        try:
            xla = robust_softmax(logits, robust=True)
        finally:
            del os.environ["NRV_NO_SINKHORN_RECT"]
    finally:
        set_use_pallas(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(want), atol=1e-7)


def test_rect_supported_gate():
    assert sinkhorn_softmax_rect_supported((2, 8, 24), 3)
    assert sinkhorn_softmax_rect_supported((8, 3136, 49), 3)   # twins s1
    assert sinkhorn_softmax_rect_supported((2, 784, 196), 3)   # cvt s2
    assert not sinkhorn_softmax_rect_supported((2, 24, 24), 3)  # square
    assert not sinkhorn_softmax_rect_supported((2, 3136, 784), 3)  # VMEM
    assert not sinkhorn_softmax_rect_supported((2, 8, 24), 0)


@pytest.mark.parametrize("which", ["cvt", "twins"])
def test_rect_model_level_fused_matches_xla(which):
    """Robust CvT / Twins-SVT forward with the rect kernel forced on equals
    the NRV_NO_SINKHORN_RECT (XLA vector form) path — the stride-reduced
    attention stages route through sinkhorn_softmax_rect."""
    import os

    if which == "cvt":
        from noise_robust_vit_tpu.models.cvt import CvT

        model = CvT(num_classes=5, robust=True,
                    s1_emb_dim=32, s1_heads=1, s1_depth=1,
                    s2_emb_dim=48, s2_heads=1, s2_depth=1,
                    s3_emb_dim=64, s3_heads=2, s3_depth=1)
    else:
        from noise_robust_vit_tpu.models.twins_svt import TwinsSVT

        model = TwinsSVT(num_classes=5, robust=True,
                         s1_emb_dim=16, s1_local_patch_size=2, s1_global_k=2,
                         s2_emb_dim=24, s2_local_patch_size=2, s2_global_k=2,
                         s3_emb_dim=32, s3_local_patch_size=2, s3_global_k=1,
                         s3_depth=1,
                         s4_emb_dim=48, s4_local_patch_size=1, s4_global_k=1,
                         s4_depth=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    set_use_pallas(True)
    try:
        fused = model.apply(params, x, mutable=["batch_stats"])[0]
        os.environ["NRV_NO_SINKHORN_RECT"] = "1"
        try:
            xla = model.apply(params, x, mutable=["batch_stats"])[0]
        finally:
            del os.environ["NRV_NO_SINKHORN_RECT"]
    finally:
        set_use_pallas(None)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               atol=5e-5, rtol=5e-5)
