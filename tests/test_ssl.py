"""Group-C tests: SSL wrappers (MAE, SimMIM, MPP, DINO, EsViT, Distill) and
the functional Recorder/Extractor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu import models


def _tiny_vit(**kw):
    cfg = dict(
        image_size=32, patch_size=8, num_classes=10, dim=32, depth=2,
        heads=2, mlp_dim=64,
    )
    cfg.update(kw)
    return models.ViT(**cfg)


class TestMAE:
    def test_loss_scalar_and_grad(self, rng):
        enc = _tiny_vit()
        mae = models.MAE(encoder=enc, decoder_dim=24, masking_ratio=0.75,
                         decoder_depth=1, decoder_heads=2, decoder_dim_head=8)
        img = jax.random.normal(rng, (2, 32, 32, 3))
        v = mae.init({"params": rng, "mask": rng}, img)
        loss = mae.apply(v, img, deterministic=False, rngs={"mask": rng})
        assert loss.shape == () and np.isfinite(float(loss))
        g = jax.grad(
            lambda p: mae.apply({"params": p}, img, deterministic=False,
                                rngs={"mask": rng})
        )(v["params"])
        gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
        assert gnorm > 0

    def test_encoder_params_shared(self, rng):
        enc = _tiny_vit()
        mae = models.MAE(encoder=enc, decoder_dim=24)
        img = jax.random.normal(rng, (2, 32, 32, 3))
        v = mae.init({"params": rng, "mask": rng}, img)
        assert "encoder" in v["params"]
        # pretrained encoder params merge over a fresh ViT init (the head is
        # never touched during MAE pretraining, so it comes from the new init)
        enc_params = v["params"]["encoder"]
        fresh = enc.init(rng, img)["params"]
        merged = {**fresh, **enc_params}
        out = enc.apply({"params": merged}, img)
        assert out.shape == (2, 10)
        # the transformer blocks really are the pretrained ones
        chex = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(jnp.all(a == b)),
                merged["layers_0_attn"], enc_params["layers_0_attn"],
            )
        )
        assert chex


class TestSimMIM:
    def test_loss(self, rng):
        enc = _tiny_vit()
        mim = models.SimMIM(encoder=enc, masking_ratio=0.5)
        img = jax.random.normal(rng, (2, 32, 32, 3))
        v = mim.init({"params": rng, "mask": rng}, img)
        loss = mim.apply(v, img, deterministic=False, rngs={"mask": rng})
        assert np.isfinite(float(loss)) and float(loss) >= 0


class TestMPP:
    def test_loss(self, rng):
        enc = _tiny_vit()
        mpp = models.MPP(transformer=enc, patch_size=8, dim=32,
                         mean=[0.5, 0.5, 0.5], std=[0.2, 0.2, 0.2])
        img = jax.random.uniform(rng, (2, 32, 32, 3))
        v = mpp.init({"params": rng, "mask": rng}, img)
        loss = mpp.apply(v, img, deterministic=False, rngs={"mask": rng})
        assert np.isfinite(float(loss)) and float(loss) > 0


class TestDino:
    def test_loss_ema_and_centers(self, rng):
        net = _tiny_vit()
        dino = models.Dino(net, image_size=32, num_classes_K=64,
                           projection_hidden_size=32, projection_layers=3)
        imgs = jax.random.uniform(rng, (4, 32, 32, 3))
        state = dino.init(rng, imgs)
        (loss, new_last), grads = jax.value_and_grad(
            dino.loss, has_aux=True
        )(state.student, state, imgs, rng)
        assert np.isfinite(float(loss))
        state = state.replace(last_centers=new_last)
        old_teacher = state.teacher
        # teacher moves toward student after EMA with changed student
        moved = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, state.student, grads)
        state = state.replace(student=moved)
        state2 = dino.update_moving_average(state)
        diff = sum(
            float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(state2.teacher),
                jax.tree_util.tree_leaves(old_teacher),
            )
        )
        assert diff > 0
        assert float(jnp.sum(jnp.abs(state2.centers))) > 0

    def test_loss_fn_matches_manual(self, rng):
        t = jax.random.normal(rng, (4, 16))
        s = jax.random.normal(jax.random.fold_in(rng, 1), (4, 16))
        centers = jnp.zeros((1, 16))
        got = models.dino_loss(t, s, 0.04, 0.9, centers)
        tp = jax.nn.softmax(t / 0.04, -1)
        sp = jax.nn.softmax(s / 0.9, -1)
        want = -jnp.mean(jnp.sum(tp * jnp.log(sp + 1e-20), -1))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


class TestEsViT:
    def test_loss_and_update(self, rng):
        net = _tiny_vit()
        es = models.EsViTTrainer(net, image_size=32, num_classes_K=32,
                                 projection_hidden_size=32, projection_layers=3)
        imgs = jax.random.uniform(rng, (2, 32, 32, 3))
        state = es.init(rng, imgs)
        loss, (lv, lr) = es.loss(state.student, state, imgs, rng)
        assert np.isfinite(float(loss))
        assert lv.shape == (1, 32) and lr.shape == (1, 32)
        state = state.replace(last_view_centers=lv, last_region_centers=lr)
        state2 = es.update_moving_average(state)
        assert float(jnp.sum(jnp.abs(state2.view_centers))) > 0


class TestDistill:
    def test_wrapper_loss(self, rng):
        student = models.DistillableViT(
            image_size=32, patch_size=8, num_classes=10, dim=32, depth=1,
            heads=2, mlp_dim=64,
        )
        teacher = _tiny_vit(depth=1)
        timg = jax.random.normal(rng, (2, 32, 32, 3))
        tv = teacher.init(rng, timg)
        teacher_apply = lambda img: teacher.apply(tv, img)
        for hard in (False, True):
            w = models.DistillWrapper(
                student=student, teacher_apply=teacher_apply, hard=hard
            )
            labels = jnp.array([1, 2])
            v = w.init(rng, timg, labels)
            loss = w.apply(v, timg, labels)
            assert np.isfinite(float(loss))


class TestRecorderExtractor:
    def test_recorder(self, rng):
        vit = _tiny_vit()
        img = jax.random.normal(rng, (2, 32, 32, 3))
        v = vit.init(rng, img)
        preds, attns = models.Recorder(vit)(v, img)
        assert preds.shape == (2, 10)
        assert attns.shape == (2, 2, 2, 17, 17)  # [B, depth, heads, N+1, N+1]

    def test_extractor(self, rng):
        vit = _tiny_vit()
        img = jax.random.normal(rng, (2, 32, 32, 3))
        v = vit.init(rng, img)
        preds, emb = models.Extractor(vit)(v, img)
        assert emb.shape[0] == 2 and emb.shape[-1] == 32
