"""Packed-qkv fused attention kernel vs the pure-JAX reference math
(CPU interpret mode; the kernel's contract is exercised on real TPU by
bench.py). Ref utils.py:207-232 / utils.py:1025-1037 semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu.ops import dot_product_attention
from noise_robust_vit_tpu.ops.pallas.block_attention import packed_attention


def _reference(qkv, heads, dim_head, robust):
    b, n, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    out = dot_product_attention(
        q, k, v, scale=dim_head**-0.5, robust=robust, use_pallas=False
    )
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)


@pytest.mark.parametrize("robust", [False, True])
@pytest.mark.parametrize("shape", [(2, 17, 2, 64), (3, 40, 1, 128)])
def test_packed_forward_matches_reference(robust, shape):
    b, n, h, d = shape
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * h * d))
    out = packed_attention(qkv, h, d, d**-0.5, robust, 3, True, True)
    ref = _reference(qkv, h, d, robust)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


@pytest.mark.parametrize("robust", [False, True])
def test_packed_gradients_match_reference(robust):
    b, n, h, d = 2, 13, 2, 64
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3 * h * d))
    tang = jax.random.normal(jax.random.PRNGKey(2), (b, n, h * d))

    def loss_kernel(qkv):
        return jnp.sum(
            packed_attention(qkv, h, d, d**-0.5, robust, 3, True, True) * tang
        )

    def loss_ref(qkv):
        return jnp.sum(_reference(qkv, h, d, robust) * tang)

    g_kernel = jax.grad(loss_kernel)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               atol=5e-6, rtol=5e-5)


def test_packed_sinkhorn_row_col_sums():
    """Doubly-stochasticity sanity through the packed path: uniform v ⇒
    output rows equal v when rows are normalized (final row norm)."""
    b, n, h, d = 1, 12, 1, 128
    qkv = jax.random.normal(jax.random.PRNGKey(3), (b, n, 3 * h * d))
    ones_v = qkv.at[..., 2 * h * d :].set(1.0)
    out = packed_attention(ones_v, h, d, d**-0.5, True, 3, True, True)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)
