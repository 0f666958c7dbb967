"""Fused talking-heads kernel (pre-mix → Sinkhorn → post-mix in one VMEM
residency, ref cait.py:110-119 around utils.py:1025-1037) vs the unfused
einsum + vector-form path, CPU interpret mode."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu.ops.pallas.talking_heads import (
    talking_heads_sinkhorn,
    talking_heads_supported,
)
from noise_robust_vit_tpu.ops.sinkhorn import (
    sinkhorn_normalize,
    talking_heads_robust_softmax,
)

SCHEDULES = [(3, True), (4, False)]


def _unfused(dots, pre, post, iters, final_row):
    mixed = jnp.einsum("bhij,hg->bgij", dots, pre.astype(dots.dtype))
    attn = jax.nn.softmax(mixed.astype(jnp.float32), axis=-1)
    attn = sinkhorn_normalize(attn, num_iters=iters, final_row_norm=final_row)
    attn = attn.astype(dots.dtype)
    return jnp.einsum("bhij,hg->bgij", attn, post.astype(attn.dtype))


def _inputs(b=2, h=4, n=21, scale=2.0):
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    dots = jax.random.normal(k[0], (b, h, n, n), jnp.float32) * scale
    pre = jax.random.normal(k[1], (h, h), jnp.float32)
    post = jax.random.normal(k[2], (h, h), jnp.float32)
    tang = jax.random.normal(k[3], (b, h, n, n), jnp.float32)
    return dots, pre, post, tang


@pytest.mark.parametrize("schedule", SCHEDULES)
@pytest.mark.parametrize("n", [21, 24])  # padded + tile-aligned
def test_forward_matches_unfused(schedule, n):
    iters, final_row = schedule
    dots, pre, post, _ = _inputs(n=n)
    got = talking_heads_sinkhorn(dots, pre, post, iters, final_row, True)
    want = _unfused(dots, pre, post, iters, final_row)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-5)


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_gradients_match_unfused(schedule):
    iters, final_row = schedule
    dots, pre, post, tang = _inputs()

    def lk(d, p, q):
        return jnp.sum(talking_heads_sinkhorn(d, p, q, iters, final_row,
                                              True) * tang)

    def lr(d, p, q):
        return jnp.sum(_unfused(d, p, q, iters, final_row) * tang)

    gk = jax.grad(lk, argnums=(0, 1, 2))(dots, pre, post)
    gr = jax.grad(lr, argnums=(0, 1, 2))(dots, pre, post)
    for name, a, b in zip(("ddots", "dpre", "dpost"), gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5, err_msg=name)


def test_dispatch_and_fallback_agree():
    """ops.talking_heads_robust_softmax: fused (robust, square, supported)
    vs env-forced unfused path agree; vanilla = plain softmax sandwich."""
    dots, pre, post, _ = _inputs(h=2, n=16)
    fused = talking_heads_robust_softmax(dots, pre, post, robust=True)
    os.environ["NRV_NO_TALKING_HEADS"] = "1"
    try:
        unfused = talking_heads_robust_softmax(dots, pre, post, robust=True)
    finally:
        del os.environ["NRV_NO_TALKING_HEADS"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=5e-6, rtol=2e-5)
    vanilla = talking_heads_robust_softmax(dots, pre, post, robust=False)
    want = jnp.einsum(
        "bhij,hg->bgij",
        jax.nn.softmax(jnp.einsum("bhij,hg->bgij", dots, pre), axis=-1),
        post,
    )
    np.testing.assert_allclose(np.asarray(vanilla), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_supported_gate():
    assert talking_heads_supported((2, 4, 21, 21), 3)
    assert not talking_heads_supported((2, 4, 21, 20), 3)   # rectangular
    assert not talking_heads_supported((4, 21, 21), 3)      # 3D
    assert not talking_heads_supported((2, 4, 1000, 1000), 3)  # VMEM
    assert not talking_heads_supported((2, 32, 196, 196), 3)  # too many heads


def test_cait_model_fused_matches_unfused():
    """Model level: robust CaiT forward with the fused kernel == env-disabled
    unfused path (the round-3 recipe for the other kernels)."""
    from noise_robust_vit_tpu.models.factory import create_model

    model = create_model("cait", num_classes=7, image_size=32, robust=True,
                         dtype=jnp.float32, depth=1, cls_depth=1, heads=4,
                         dim=64, mlp_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    fused = model.apply(params, x)
    os.environ["NRV_NO_TALKING_HEADS"] = "1"
    try:
        unfused = model.apply(params, x)
    finally:
        del os.environ["NRV_NO_TALKING_HEADS"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=5e-5, rtol=5e-5)
