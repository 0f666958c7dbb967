"""Streaming q/k/v-interface Sinkhorn kernel (ops/pallas/streaming_sinkhorn.py).

Interpret-mode parity vs the vector form (ops/sinkhorn.py — the reference's
utils.py:1025-1037 schedules) for forward and all three input grads, across
square and rectangular shapes including padded-tile geometries, plus the
model-level CvT/Twins giant-N dispatch wiring (ref cvt.py:60-102,
twins_svt.py:122-153).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu import ops
from noise_robust_vit_tpu.ops.pallas.streaming_sinkhorn import (
    streaming_attention,
    streaming_supported,
)
from noise_robust_vit_tpu.ops.sinkhorn import sinkhorn_attention as vector_sinkhorn


def _reference(q, k, v, scale, iters, final_row):
    s = (q @ jnp.swapaxes(k, -1, -2) * scale).astype(jnp.float32)
    attn = vector_sinkhorn(s, num_iters=iters, final_row_norm=final_row)
    return attn @ v.astype(jnp.float32)


# square, rectangular-wide, rectangular-tall (Twins global 3136×64 class),
# multi-tile N (n > 256 exercises the sweep loop), and unaligned everything
SHAPES = [
    (2, 2, 37, 21, 16),
    (1, 1, 300, 100, 32),   # two query tiles (tq=256, n_pad=512)
    (2, 1, 64, 64, 8),
    (1, 2, 260, 130, 24),   # both sides pad (n 260→512, m 130→256)
    (2, 1, 49, 196, 16),    # wide: more keys than queries
]
SCHEDULES = [(3, True), (4, False), (1, True), (2, False)]


@pytest.mark.parametrize("iters,final_row", SCHEDULES)
@pytest.mark.parametrize("shape", SHAPES)
def test_streaming_matches_vector_form(shape, iters, final_row):
    b, h, n, m, d = shape
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(keys[0], (b, h, n, d))
    k = jax.random.normal(keys[1], (b, h, m, d))
    v = jax.random.normal(keys[2], (b, h, m, d))
    g = jax.random.normal(keys[3], (b, h, n, d))
    scale = d**-0.5

    o = streaming_attention(q, k, v, scale, iters, final_row, True)
    o_ref = _reference(q, k, v, scale, iters, final_row)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=5e-6, rtol=1e-5)

    def loss_k(q, k, v):
        return jnp.sum(streaming_attention(q, k, v, scale, iters,
                                           final_row, True) * g)

    def loss_r(q, k, v):
        return jnp.sum(_reference(q, k, v, scale, iters, final_row) * g)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"d{name} {shape} "
                                           f"({iters},{final_row})")


def test_streaming_bf16_io():
    """bf16 q/k/v in, bf16 out — internal math stays f32 (the kernel casts
    per tile), matching the vector form's f32 policy."""
    b, h, n, m, d = 2, 2, 40, 24, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, m, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, m, d), jnp.bfloat16)
    o = streaming_attention(q, k, v, d**-0.5, 3, True, True)
    assert o.dtype == jnp.bfloat16
    o_ref = _reference(q.astype(jnp.float32), k.astype(jnp.float32),
                       v.astype(jnp.float32), d**-0.5, 3, True)
    np.testing.assert_allclose(np.asarray(o, np.float32),
                               np.asarray(o_ref), atol=3e-2, rtol=3e-2)


def test_streaming_supported_gate():
    # CvT stage-1 at 224px: the design target must fit
    assert streaming_supported(1, 1, 3136, 784, 64)
    # Twins global stage-1: tall/narrow
    assert streaming_supported(2, 1, 3136, 64, 64)
    # degenerate
    assert not streaming_supported(1, 1, 0, 10, 64)


def test_dispatch_policy_giant_n_only():
    """Auto dispatch reserves the streaming kernel for the giant-N regime
    the resident logits kernels refuse (N_pad > 640)."""
    try:
        ops.set_use_pallas(True)
        assert ops.streaming_dispatch(True, 1, 1, 3136, 784, 64)
        assert not ops.streaming_dispatch(True, 8, 12, 196, 196, 64)
        assert not ops.streaming_dispatch(False, 1, 1, 3136, 784, 64)
    finally:
        ops.set_use_pallas(None)


def _model_fused_vs_xla(model, x):
    """Apply a model with the streaming path forced on vs fully off;
    outputs and all parameter grads must agree."""
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        out = model.apply(v, x, return_features=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    import os

    try:
        os.environ["NRV_NO_STREAMING"] = "1"
        ref_out = model.apply(variables, x)
        ref_grad = jax.grad(loss)(variables, x)
    finally:
        os.environ.pop("NRV_NO_STREAMING", None)
    try:
        ops.set_use_pallas(True)
        # isolate the streaming branch: resident logits kernels stay off
        os.environ["NRV_NO_SINKHORN_SOFTMAX"] = "1"
        os.environ["NRV_NO_SINKHORN_RECT"] = "1"
        os.environ["NRV_STREAM_ALL"] = "1"
        fused_out = model.apply(variables, x)
        fused_grad = jax.grad(loss)(variables, x)
    finally:
        ops.set_use_pallas(None)
        for k in ("NRV_NO_SINKHORN_SOFTMAX", "NRV_NO_SINKHORN_RECT",
                  "NRV_STREAM_ALL"):
            os.environ.pop(k, None)
    np.testing.assert_allclose(np.asarray(fused_out), np.asarray(ref_out),
                               atol=2e-5, rtol=1e-4)
    flat_f = jax.tree_util.tree_leaves_with_path(fused_grad)
    flat_r = jax.tree_util.tree_leaves(ref_grad)
    for (path, a), b in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_cvt_robust_streaming_path_matches_xla():
    from noise_robust_vit_tpu.models.cvt import CvT

    model = CvT(num_classes=7, s1_depth=1, s2_depth=1, s3_depth=1,
                robust=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    _model_fused_vs_xla(model, x)


def test_twins_global_robust_streaming_path_matches_xla():
    from noise_robust_vit_tpu.models.twins_svt import TwinsSVT

    model = TwinsSVT(num_classes=5, robust=True,
                     s1_emb_dim=16, s1_local_patch_size=2, s1_global_k=2,
                     s2_emb_dim=24, s2_local_patch_size=2, s2_global_k=2,
                     s3_emb_dim=32, s3_local_patch_size=2, s3_global_k=1,
                     s3_depth=1,
                     s4_emb_dim=48, s4_local_patch_size=1, s4_global_k=1,
                     s4_depth=1)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    _model_fused_vs_xla(model, x)
