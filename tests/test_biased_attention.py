"""Biased (windowed) fused attention kernel vs the pure-JAX reference math
(CPU interpret mode) — the Swin/LeViT robust fast path: additive
per-(window, head) bias, plain and Sinkhorn paths, forward + gradients
including dbias. Ref swin.py:186-244, levit.py:225-278 semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu.ops import dot_product_attention
from noise_robust_vit_tpu.ops.pallas.biased_attention import (
    biased_attention,
    biased_attention_supported,
)


def _reference(q, k, v, bias, nw, robust, iters=3, final_row=True):
    bw, h, n, _ = q.shape
    full_bias = jnp.tile(bias, (bw // nw, 1, 1, 1))  # [BW, H, N, N]
    return dot_product_attention(
        q, k, v, scale=q.shape[-1] ** -0.5, bias=full_bias, robust=robust,
        sinkhorn_iters=iters, final_row_norm=final_row, use_pallas=False,
    )


@pytest.mark.parametrize("robust", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        # (BW, H, N, D, DV, nW): swin-like (windows, N=49-ish), levit-like
        # (nW=1, DV != D), and a window count smaller than the batch group
        (8, 3, 23, 32, 32, 4),
        (4, 2, 17, 16, 32, 1),
    ],
)
def test_biased_forward_matches_reference(robust, shape):
    bw, h, n, d, dv, nw = shape
    kq, kk, kv, kb = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (bw, h, n, d))
    k = jax.random.normal(kk, (bw, h, n, d))
    v = jax.random.normal(kv, (bw, h, n, dv))
    bias = jax.random.normal(kb, (nw, h, n, n))
    assert biased_attention_supported(bw, h, n, d, dv, nw)
    out = biased_attention(q, k, v, bias, d**-0.5, robust, 3, True, nw, True)
    ref = _reference(q, k, v, bias, nw, robust)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


@pytest.mark.parametrize("robust", [False, True])
@pytest.mark.parametrize("schedule", [(3, True), (4, False)])
def test_biased_gradients_match_reference(robust, schedule):
    iters, final_row = schedule
    if not robust and schedule != (3, True):
        pytest.skip("schedule only affects the robust path")
    bw, h, n, d, dv, nw = 8, 2, 19, 32, 32, 4
    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(keys[0], (bw, h, n, d))
    k = jax.random.normal(keys[1], (bw, h, n, d))
    v = jax.random.normal(keys[2], (bw, h, n, dv))
    bias = jax.random.normal(keys[3], (nw, h, n, n))
    tang = jax.random.normal(keys[4], (bw, h, n, dv))

    def loss_kernel(q, k, v, bias):
        return jnp.sum(
            biased_attention(q, k, v, bias, d**-0.5, robust, iters,
                             final_row, nw, True) * tang
        )

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            _reference(q, k, v, bias, nw, robust, iters, final_row) * tang
        )

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("q k v bias".split(), gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6, rtol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_swin_robust_fused_path_matches_xla():
    """End-to-end wiring: a tiny robust Swin forward+grad with the fused
    biased kernel forced on (interpret mode on CPU) must match the XLA
    path — covers the bias+shift-mask merge and the v1 dispatch
    (models/swin.py use_fused branch)."""
    from noise_robust_vit_tpu import models, ops

    m = models.SwinTransformer(
        patch_size=(4, 4), embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window_size=(4, 4), num_classes=5, robust=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(1), x)

    def loss(variables, x):
        return jnp.sum(m.apply(variables, x) ** 2)

    ref_out = m.apply(v, x)
    ref_grad = jax.grad(loss)(v, x)
    try:
        ops.set_use_pallas(True)
        fused_out = m.apply(v, x)
        fused_grad = jax.grad(loss)(v, x)
    finally:
        ops.set_use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=1e-5, rtol=1e-4
    )
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_grad)
    fused_leaves = jax.tree_util.tree_leaves(fused_grad)
    for (path, a), b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_swin_v2_robust_fused_path_matches_xla():
    """Same wiring check for v2 (cosine attention with the logit scale
    folded into q, continuous log-CPB bias)."""
    from noise_robust_vit_tpu import models, ops

    m = models.SwinTransformer(
        patch_size=(4, 4), embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window_size=(4, 4), num_classes=5, robust=True, version=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(3), x)
    ref_out = m.apply(v, x)
    try:
        ops.set_use_pallas(True)
        fused_out = m.apply(v, x)
    finally:
        ops.set_use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=1e-5, rtol=1e-4
    )


def test_levit_robust_fused_path_matches_xla():
    """End-to-end wiring: a tiny robust LeViT forward with the fused biased
    kernel forced on (interpret mode on CPU) must match the XLA path —
    covers the per-head bias-table operand with nW=1 and DV != D
    (models/levit.py LevitAttention fast path)."""
    from noise_robust_vit_tpu import models, ops

    m = models.LeViT(
        img_size=32, patch_size=16, num_classes=5, embed_dim=(32, 48),
        key_dim=(16, 16), depth=(1, 1), num_heads=(2, 2),
        attn_ratio=(2, 2), mlp_ratio=(2, 2),
        down_ops=(("Subsample", 16, 2, 2, 2, 2),), robust=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(5), x)
    ref_out = m.apply(variables, x)
    try:
        ops.set_use_pallas(True)
        fused_out = m.apply(variables, x)
    finally:
        ops.set_use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=1e-5, rtol=1e-4
    )


def test_max_vit_robust_fused_path_matches_xla():
    """End-to-end wiring: a tiny robust MaxViT forward with the fused biased
    kernel forced on (interpret mode on CPU) must match the XLA path —
    covers the shared per-head rel-pos bias with nW=1 over BOTH the block-
    and grid-attention window groupings (models/max_vit.py fast path)."""
    from noise_robust_vit_tpu import models, ops

    m = models.MaxViT(
        num_classes=5, dim=32, depth=(1, 1), dim_head=16, window_size=4,
        dropout=0.0, robust=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(7), x)
    ref_out = m.apply(variables, x)
    try:
        ops.set_use_pallas(True)
        fused_out = m.apply(variables, x)
    finally:
        ops.set_use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=1e-5, rtol=1e-4
    )


def test_bias_broadcast_over_batch_images():
    """dbias must SUM over the images sharing each window's bias."""
    bw, h, n, d, nw = 6, 1, 9, 16, 2  # 3 images × 2 windows
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(keys[0], (bw, h, n, d))
    k = jax.random.normal(keys[1], (bw, h, n, d))
    v = jax.random.normal(keys[2], (bw, h, n, d))
    bias = jax.random.normal(keys[3], (nw, h, n, n))

    def loss(bias):
        return jnp.sum(
            biased_attention(q, k, v, bias, d**-0.5, True, 3, True, nw, True)
        )

    def loss_ref(bias):
        return jnp.sum(_reference(q, k, v, bias, nw, True))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(bias)),
        np.asarray(jax.grad(loss_ref)(bias)),
        atol=5e-6, rtol=5e-5,
    )


def test_twins_local_robust_fused_path_matches_xla():
    """End-to-end wiring: robust Twins-SVT's LOCAL attention with the fused
    biased kernel (zero bias) forced on must match the XLA composition —
    fwd + grads (models/twins_svt.py _LocalAttention fused branch; the XLA
    path OOMed HBM at bs128 on v5e by materializing [BW,H,49,49] residuals)."""
    from noise_robust_vit_tpu import ops
    from noise_robust_vit_tpu.models.twins_svt import TwinsSVT

    m = TwinsSVT(num_classes=5, robust=True,
                 s1_emb_dim=16, s1_local_patch_size=2, s1_global_k=2,
                 s2_emb_dim=24, s2_local_patch_size=2, s2_global_k=2,
                 s3_emb_dim=32, s3_local_patch_size=2, s3_global_k=1,
                 s3_depth=1,
                 s4_emb_dim=48, s4_local_patch_size=1, s4_global_k=1,
                 s4_depth=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(1), x)

    def loss(variables, x):
        return jnp.sum(m.apply(variables, x) ** 2)

    ref_out = m.apply(v, x)
    ref_grad = jax.grad(loss)(v, x)
    # Isolate the _LocalAttention fused-biased branch: keep the global-
    # attention rect/sinkhorn-softmax kernels OFF during the fused run so a
    # failure here points at the branch under test, not another kernel.
    import os

    try:
        ops.set_use_pallas(True)
        os.environ["NRV_NO_SINKHORN_SOFTMAX"] = "1"
        os.environ["NRV_NO_SINKHORN_RECT"] = "1"
        fused_out = m.apply(v, x)
        fused_grad = jax.grad(loss)(v, x)
    finally:
        ops.set_use_pallas(None)
        os.environ.pop("NRV_NO_SINKHORN_SOFTMAX", None)
        os.environ.pop("NRV_NO_SINKHORN_RECT", None)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=1e-5, rtol=1e-4
    )
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_grad)
    fused_leaves = jax.tree_util.tree_leaves(fused_grad)
    # atol 2e-4: measured f32 floor — the sum-of-squares loss makes grads
    # O(10-30), and the PEG/depthwise-conv grads accumulate near-cancelling
    # contributions across the whole stage (worst observed: 1.1e-4 abs at
    # 5e-3 rel on 2/144 elements, pure reduction-order noise; the kernel
    # bwd itself is checked at 5e-6 in the op-level tests above)
    for (path, a), b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("robust", [False, True])
def test_no_bias_static_path_matches_zero_bias(robust):
    """`no_bias=True` (the Twins local-attention fast path) must reproduce
    the zero-bias kernel exactly for fwd and dq/dk/dv, and return an exact
    zero bias-cotangent without computing dbias (round-5 ADVICE fix)."""
    bw, h, n, d = 8, 2, 21, 16
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(keys[0], (bw, h, n, d))
    k = jax.random.normal(keys[1], (bw, h, n, d))
    v = jax.random.normal(keys[2], (bw, h, n, d))
    bias = jnp.zeros((1, h, n, n), jnp.float32)
    tang = jax.random.normal(keys[3], (bw, h, n, d))

    def loss(fn_no_bias, q, k, v, bias):
        return jnp.sum(
            biased_attention(q, k, v, bias, d**-0.5, robust, 3, True, 1,
                             True, fn_no_bias) * tang
        )

    o_ref = biased_attention(q, k, v, bias, d**-0.5, robust, 3, True, 1,
                             True, False)
    o_nb = biased_attention(q, k, v, bias, d**-0.5, robust, 3, True, 1,
                            True, True)
    np.testing.assert_allclose(np.asarray(o_nb), np.asarray(o_ref), atol=0)
    g_ref = jax.grad(loss, argnums=(1, 2, 3, 4))(False, q, k, v, bias)
    g_nb = jax.grad(loss, argnums=(1, 2, 3, 4))(True, q, k, v, bias)
    for name, a, b in zip("qkv", g_nb[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=f"d{name}")
    assert not np.asarray(g_nb[3]).any()


def test_twins_local_plain_fused_experiment_matches_xla():
    """Twins' PLAIN-softmax local attention routes through the zero-bias
    fused kernel by default (round-5 measured +24% on chip; the XLA
    composition stays reachable via NRV_NO_FUSED_PLAIN_LOCAL); the fused
    branch must be output- and grad-exact vs the XLA composition."""
    from noise_robust_vit_tpu import ops
    from noise_robust_vit_tpu.models.twins_svt import TwinsSVT

    m = TwinsSVT(num_classes=5, robust=False,
                 s1_emb_dim=16, s1_local_patch_size=2, s1_global_k=2,
                 s2_emb_dim=24, s2_local_patch_size=2, s2_global_k=2,
                 s3_emb_dim=32, s3_local_patch_size=2, s3_global_k=1,
                 s3_depth=1,
                 s4_emb_dim=48, s4_local_patch_size=1, s4_global_k=1,
                 s4_depth=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(1), x)

    def loss(variables, x):
        return jnp.sum(m.apply(variables, x) ** 2)

    ref_out = m.apply(v, x)
    ref_grad = jax.grad(loss)(v, x)
    try:
        ops.set_use_pallas(True)  # plain-local fusion is now the default
        fused_out = m.apply(v, x)
        fused_grad = jax.grad(loss)(v, x)
    finally:
        ops.set_use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=1e-5, rtol=1e-4
    )
    flat_f = jax.tree_util.tree_leaves_with_path(fused_grad)
    flat_r = jax.tree_util.tree_leaves(ref_grad)
    for (path, a), b in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )
