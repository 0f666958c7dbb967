"""Packed-qkv fused attention kernel vs the pure-JAX reference math
(CPU interpret mode; the kernel's contract is exercised on real TPU by
bench.py). Ref utils.py:207-232 / utils.py:1025-1037 semantics.

The schedule matrix covers BOTH Sinkhorn schedules the reference uses:
(3, True) — the SinkhornAttention op (ref utils.py:1031-1037) — and
(4, False) — the vendored-MHA path that vit_b_16(robust=True) ships on TPU
(ref utils.py:218-224, models/vision_transformer.py) — plus (4, True),
which exercises the residual-row buffer beyond one sublane tile
(_num_vecs=9 → vec_rows=16; round-2 advisor overflow finding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu.ops import dot_product_attention
from noise_robust_vit_tpu.ops.pallas.block_attention import packed_attention

# (sinkhorn_iters, final_row_norm) schedules; ignored when robust=False
SCHEDULES = [(3, True), (4, False), (4, True)]


def _reference(qkv, heads, dim_head, robust, iters=3, final_row=True):
    b, n, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    out = dot_product_attention(
        q, k, v, scale=dim_head**-0.5, robust=robust,
        sinkhorn_iters=iters, final_row_norm=final_row, use_pallas=False,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)


@pytest.mark.parametrize("robust", [False, True])
@pytest.mark.parametrize("schedule", SCHEDULES)
@pytest.mark.parametrize("shape", [(2, 17, 2, 64), (3, 40, 1, 128)])
def test_packed_forward_matches_reference(robust, schedule, shape):
    iters, final_row = schedule
    if not robust and schedule != SCHEDULES[0]:
        pytest.skip("schedule only affects the robust path")
    b, n, h, d = shape
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * h * d))
    out = packed_attention(qkv, h, d, d**-0.5, robust, iters, final_row, True)
    ref = _reference(qkv, h, d, robust, iters, final_row)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


@pytest.mark.parametrize("robust", [False, True])
@pytest.mark.parametrize("schedule", SCHEDULES)
def test_packed_gradients_match_reference(robust, schedule):
    iters, final_row = schedule
    if not robust and schedule != SCHEDULES[0]:
        pytest.skip("schedule only affects the robust path")
    b, n, h, d = 2, 13, 2, 64
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3 * h * d))
    tang = jax.random.normal(jax.random.PRNGKey(2), (b, n, h * d))

    def loss_kernel(qkv):
        return jnp.sum(
            packed_attention(qkv, h, d, d**-0.5, robust, iters, final_row, True)
            * tang
        )

    def loss_ref(qkv):
        return jnp.sum(_reference(qkv, h, d, robust, iters, final_row) * tang)

    g_kernel = jax.grad(loss_kernel)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               atol=5e-6, rtol=5e-5)


def test_vit_b16_shipping_config_gradients():
    """The exact dispatch vit_b_16(robust=True) takes on TPU: ViT-B head
    geometry (h=12 → 2 head-groups of 2×64, N=197) at the vendored-MHA
    4-iteration no-final-row schedule (ref utils.py:218-224) — forward and
    backward vs the XLA reference (round-2 verdict weak spot #4)."""
    b, n, h, d = 2, 197, 4, 64  # 2 head-groups, the real ViT-B/16 N
    qkv = jax.random.normal(jax.random.PRNGKey(5), (b, n, 3 * h * d))
    tang = jax.random.normal(jax.random.PRNGKey(6), (b, n, h * d))

    def loss_kernel(qkv):
        return jnp.sum(
            packed_attention(qkv, h, d, d**-0.5, True, 4, False, True) * tang
        )

    def loss_ref(qkv):
        return jnp.sum(_reference(qkv, h, d, True, 4, False) * tang)

    out = packed_attention(qkv, h, d, d**-0.5, True, 4, False, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_reference(qkv, h, d, True, 4, False)),
        atol=2e-6, rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_kernel)(qkv)),
        np.asarray(jax.grad(loss_ref)(qkv)),
        atol=5e-6, rtol=5e-5,
    )


def test_packed_sinkhorn_row_col_sums():
    """Doubly-stochasticity sanity through the packed path: uniform v ⇒
    output rows equal v when rows are normalized (final row norm)."""
    b, n, h, d = 1, 12, 1, 128
    qkv = jax.random.normal(jax.random.PRNGKey(3), (b, n, 3 * h * d))
    ones_v = qkv.at[..., 2 * h * d :].set(1.0)
    out = packed_attention(ones_v, h, d, d**-0.5, True, 3, True, True)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)
