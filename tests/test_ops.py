"""L0 op tests: Sinkhorn normalization properties (matches the reference's
smoke check, ref utils.py:1208-1213), posemb formulas, attention equivalences,
regularizers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu import ops


class TestSinkhorn:
    def test_row_and_col_sums(self, rng):
        # SinkhornAttention schedule: 3 iters + final row norm → rows sum to 1
        # exactly, cols approximately (ref utils.py:1208-1213).
        logits = jax.random.normal(rng, (2, 4, 32, 32))
        attn = ops.sinkhorn_attention(logits)
        rows = jnp.sum(attn, axis=-1)
        cols = jnp.sum(attn, axis=-2)
        np.testing.assert_allclose(rows, np.ones_like(rows), rtol=1e-5)
        np.testing.assert_allclose(cols, np.ones_like(cols), atol=0.05)

    def test_mha_schedule_col_sums(self, rng):
        # vendored-MHA schedule: 4 iters, ends on a column norm → cols sum to 1
        # exactly (ref utils.py:218-224).
        logits = jax.random.normal(rng, (3, 16, 16))
        attn = ops.sinkhorn_attention(logits, num_iters=4, final_row_norm=False)
        cols = jnp.sum(attn, axis=-2)
        np.testing.assert_allclose(cols, np.ones_like(cols), rtol=1e-5)

    def test_nonnegative_and_finite(self, rng):
        logits = 10.0 * jax.random.normal(rng, (2, 8, 8))
        attn = ops.sinkhorn_attention(logits)
        assert bool(jnp.all(jnp.isfinite(attn)))
        assert bool(jnp.all(attn >= 0))

    def test_robust_softmax_defaults_to_softmax(self, rng):
        logits = jax.random.normal(rng, (2, 8, 8))
        np.testing.assert_allclose(
            ops.robust_softmax(logits, robust=False),
            jax.nn.softmax(logits, axis=-1),
            rtol=1e-6,
        )


class TestPosemb:
    def test_2d_matches_reference_formula(self):
        h, w, dim, temp = 3, 5, 16, 10000.0
        pe = np.asarray(ops.posemb_sincos_2d(h, w, dim))
        assert pe.shape == (h * w, dim)
        # spot-check against the reference formula (ref simple_vit.py:15-28)
        omega = np.arange(dim // 4) / (dim // 4 - 1)
        omega = 1.0 / temp**omega
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        y = ys.flatten()[:, None] * omega
        x = xs.flatten()[:, None] * omega
        expected = np.concatenate([np.sin(x), np.cos(x), np.sin(y), np.cos(y)], 1)
        np.testing.assert_allclose(pe, expected, atol=1e-6)

    def test_1d_3d_shapes(self):
        assert ops.posemb_sincos_1d(7, 32).shape == (7, 32)
        assert ops.posemb_sincos_3d(2, 3, 4, 36).shape == (24, 36)
        assert ops.posemb_sincos_3d(2, 3, 4, 64).shape == (24, 64)  # pad path

    def test_resize_posemb_grid(self):
        pe = jnp.arange(1 + 16, dtype=jnp.float32)[:, None] * jnp.ones((1, 8))
        out = ops.resize_posemb_grid(pe, (8, 8), num_prefix_tokens=1)
        assert out.shape == (1 + 64, 8)
        np.testing.assert_allclose(out[0], pe[0])  # cls token untouched


class TestAttention:
    def test_robust_matches_composition(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (2, 3, 10, 8))
        k = jax.random.normal(k2, (2, 3, 10, 8))
        v = jax.random.normal(k3, (2, 3, 10, 8))
        out = ops.dot_product_attention(q, k, v, robust=True, use_pallas=False)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (8**-0.5)
        attn = ops.sinkhorn_attention(logits)
        expected = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_mask_blocks_attention(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (1, 1, 4, 8))
        k = jax.random.normal(k2, (1, 1, 4, 8))
        v = jax.random.normal(k3, (1, 1, 4, 8))
        mask = jnp.ones((1, 1, 4, 4), bool).at[..., -1].set(False)
        w = ops.attention_weights(q, k, mask=mask)
        np.testing.assert_allclose(w[..., -1], np.zeros((1, 1, 4)), atol=1e-8)

    def test_pallas_interpret_matches_xla(self, rng):
        # fused kernel (interpret mode on CPU) vs pure-JAX path
        from noise_robust_vit_tpu.ops.pallas import sinkhorn_attention as pk
        import jax.experimental.pallas as pl  # noqa: F401

        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (2, 2, 100, 32), jnp.float32)
        k = jax.random.normal(k2, (2, 2, 100, 32), jnp.float32)
        v = jax.random.normal(k3, (2, 2, 100, 32), jnp.float32)
        for robust in (False, True):
            expected = ops.dot_product_attention(q, k, v, robust=robust, use_pallas=False)
            import unittest.mock as mock

            with mock.patch.object(pk.pl, "pallas_call", _interpreted(pk.pl.pallas_call)):
                got = pk.fused_attention(q, k, v, robust=robust)
            assert got is not None
            np.testing.assert_allclose(got, expected, atol=5e-4)


    def test_pallas_interpret_grads_match_reference(self, rng):
        """custom_vjp path (incl. the stored-scaling-vector residuals) in
        interpret mode vs the pure-JAX reference, both schedules + plain."""
        from noise_robust_vit_tpu.ops.pallas import sinkhorn_attention as pk
        import unittest.mock as mock

        k1, k2, k3 = jax.random.split(rng, 3)
        q = jax.random.normal(k1, (1, 2, 50, 16), jnp.float32)
        k = jax.random.normal(k2, (1, 2, 50, 16), jnp.float32)
        v = jax.random.normal(k3, (1, 2, 50, 16), jnp.float32)
        cases = [
            (False, 0, False),
            (True, 3, True),   # SinkhornAttention schedule
            (True, 4, False),  # vendored-MHA schedule
        ]
        for robust, iters, fr in cases:
            def fused(q, k, v):
                return pk.fused_attention(
                    q, k, v, scale=0.25, robust=robust,
                    sinkhorn_iters=iters, final_row_norm=fr,
                ).sum()

            def ref(q, k, v):
                return pk._reference_attention(
                    q, k, v, 0.25, robust, iters, fr
                ).sum()

            with mock.patch.object(pk.pl, "pallas_call", _interpreted(pk.pl.pallas_call)):
                got = jax.grad(fused, argnums=(0, 1, 2))(q, k, v)
            want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
            for g, w in zip(got, want):
                np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-4)


def _interpreted(pallas_call):
    import functools

    @functools.wraps(pallas_call)
    def wrapper(*args, **kwargs):
        kwargs["interpret"] = True
        return pallas_call(*args, **kwargs)

    return wrapper


class TestRegularizers:
    def test_drop_path_deterministic(self, rng):
        x = jnp.ones((4, 3, 3))
        assert (ops.drop_path(x, 0.5, rng, deterministic=True) == x).all()

    def test_drop_path_scales(self, rng):
        x = jnp.ones((1000, 2))
        y = ops.drop_path(x, 0.5, rng)
        # survivors scaled by 1/keep; mean preserved in expectation
        assert abs(float(y.mean()) - 1.0) < 0.1
        vals = np.unique(np.asarray(y))
        assert set(np.round(vals, 4)) <= {0.0, 2.0}

    def test_cutmix_shapes_and_lambda(self, rng):
        imgs = jax.random.normal(rng, (8, 16, 16, 3))
        labels = jnp.arange(8)
        mixed, (la, lb, lam) = ops.cutmix(rng, imgs, labels)
        assert mixed.shape == imgs.shape
        assert la.shape == lb.shape == (8,)
        assert 0.0 <= float(lam) <= 1.0

    def test_patch_dropout_indices(self, rng):
        idx = ops.patch_dropout_indices(rng, 4, 16, 0.5)
        assert idx.shape == (4, 8)
        for row in np.asarray(idx):
            assert len(set(row.tolist())) == 8  # no replacement


class TestSimpleViT:
    @pytest.mark.parametrize("robust", [False, True])
    def test_forward(self, rng, robust):
        from noise_robust_vit_tpu import SimpleViT

        model = SimpleViT(
            image_size=32, patch_size=8, num_classes=10, dim=64,
            depth=2, heads=4, mlp_dim=128, robust=robust,
        )
        x = jax.random.normal(rng, (2, 32, 32, 3))
        params = model.init(rng, x)
        logits = model.apply(params, x)
        assert logits.shape == (2, 10)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_recording_captures_attention(self, rng):
        from noise_robust_vit_tpu import SimpleViT
        from noise_robust_vit_tpu.models.layers import recording

        model = SimpleViT(
            image_size=32, patch_size=8, num_classes=10, dim=64,
            depth=2, heads=4, mlp_dim=128, robust=True,
        )
        x = jax.random.normal(rng, (2, 32, 32, 3))
        params = model.init(rng, x)
        with recording():
            logits, state = model.apply(params, x, mutable=["intermediates"])
        attns = [
            v for k, v in jax.tree_util.tree_leaves_with_path(state["intermediates"])
            if "attn" in jax.tree_util.keystr(k)
        ]
        assert len(attns) == 2  # one per layer
        assert attns[0].shape == (2, 4, 16, 16)
        # robust → rows sum to one
        np.testing.assert_allclose(np.asarray(attns[0].sum(-1)), 1.0, rtol=1e-4)


class TestSinkhornStability:
    def test_starved_key_no_overflow(self, rng):
        """Training can sharpen attention until a key receives ~0 mass; the
        vector-form Sinkhorn must clamp instead of overflowing f32
        (regression: NaN at epoch ~9 of robust ViT training)."""
        logits = jax.random.normal(rng, (2, 2, 32, 32))
        logits = logits.at[..., :, 5].add(-60.0)  # starve key 5 everywhere
        attn = ops.sinkhorn_attention(logits)
        assert np.isfinite(np.asarray(attn)).all()
        # grads through the full robust attention also finite
        q = jax.random.normal(rng, (1, 1, 16, 8)) * 8  # sharp attention
        g = jax.grad(
            lambda q: jnp.sum(
                ops.dot_product_attention(q, q, q, robust=True, use_pallas=False) ** 2
            )
        )(q)
        assert np.isfinite(np.asarray(g)).all()

    def test_synthetic_patterns_shared_across_splits(self):
        from noise_robust_vit_tpu import datasets

        tr = datasets.synthetic_dataset(512, 16, 10, seed=0)
        va = datasets.synthetic_dataset(512, 16, 10, seed=1)

        def class_means(ds):
            return np.stack([
                ds.images[ds.labels == c].mean(0).ravel() for c in range(10)
            ])

        mt, mv = class_means(tr), class_means(va)
        mt = mt - mt.mean(0)
        mv = mv - mv.mean(0)
        # same-class means across splits correlate far more than cross-class
        same = np.mean([
            np.dot(mt[c], mv[c]) / (np.linalg.norm(mt[c]) * np.linalg.norm(mv[c]))
            for c in range(10)
        ])
        assert same > 0.8
