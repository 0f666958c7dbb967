"""Fused LayerNorm kernel (ops/pallas/fused_ln.py) vs flax LayerNorm —
forward + gradients in interpret mode, plus the NRV_FUSED_LN model gate
(the VERDICT-r2 #9 experiment wiring in models/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu.ops.pallas.fused_ln import (
    fused_layer_norm,
    fused_ln_supported,
)


@pytest.mark.parametrize("rows", [64, 500])  # 500: row padding path
@pytest.mark.parametrize("d", [128, 768])
def test_fused_ln_matches_flax(rows, d):
    assert fused_ln_supported(d)
    kx, kg, kb, kdy = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(kx, (rows, d))
    g = jax.random.normal(kg, (d,)) * 0.2 + 1.0
    b = jax.random.normal(kb, (d,)) * 0.1
    dy = jax.random.normal(kdy, (rows, d))

    def ref(x, g, b):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return xc * jax.lax.rsqrt(var + 1e-5) * g + b

    out = fused_layer_norm(x, g, b, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref(x, g, b)), atol=1e-5, rtol=1e-5
    )

    f_fused = lambda *a: jnp.sum(fused_layer_norm(*a, 1e-5, True) * dy)
    f_ref = lambda *a: jnp.sum(ref(*a) * dy)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(x, g, b)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, g, b)
    for a, r in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-4
        )


def test_fused_ln_3d_and_model_gate(monkeypatch):
    """[B, N, D] input reshaping, and the env-gated swap in the shared
    blocks: same params, same logits (interpret mode on CPU)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 128))
    g = jnp.ones((128,))
    b = jnp.zeros((128,))
    out = fused_layer_norm(x, g, b, 1e-5, True)
    ref = (x - x.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        x.var(-1, keepdims=True) + 1e-5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    from noise_robust_vit_tpu.models import SimpleViT

    m = SimpleViT(image_size=16, patch_size=8, num_classes=4, dim=128,
                  depth=1, heads=2, mlp_dim=128, robust=True)
    xi = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(3), xi)
    ref_logits = m.apply(v, xi)
    monkeypatch.setenv("NRV_FUSED_LN", "1")
    fused_logits = m.apply(v, xi)  # same params: module is param-compatible
    np.testing.assert_allclose(
        np.asarray(fused_logits), np.asarray(ref_logits), atol=1e-5, rtol=1e-4
    )
