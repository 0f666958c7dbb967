"""Group-B variant tests (vit_variants.py): shape + finiteness per the
upstream vit-pytorch test pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_robust_vit_tpu.models import vit_variants as V


def _check(model, x, rng, train=False, out_shape=(2, 10)):
    variables = model.init({"params": rng, "dropout": rng}, x)
    if train:
        out = model.apply(
            variables, x, deterministic=False, rngs={"dropout": rng}
        )
    else:
        out = model.apply(variables, x)
    assert out.shape == out_shape
    assert np.isfinite(np.asarray(out, np.float32)).all()
    return variables


def test_simple_vit_1d(rng):
    m = V.SimpleViT1D(seq_len=64, patch_size=8, num_classes=10, dim=32,
                      depth=2, heads=2, mlp_dim=64)
    _check(m, jax.random.normal(rng, (2, 64, 3)), rng)


def test_vit_1d(rng):
    m = V.ViT1D(seq_len=64, patch_size=8, num_classes=10, dim=32, depth=2,
                heads=2, mlp_dim=64, dropout=0.1, emb_dropout=0.1)
    _check(m, jax.random.normal(rng, (2, 64, 3)), rng, train=True)


def test_simple_vit_3d(rng):
    m = V.SimpleViT3D(image_size=16, image_patch_size=8, frames=4,
                      frame_patch_size=2, num_classes=10, dim=36, depth=1,
                      heads=2, mlp_dim=64)
    _check(m, jax.random.normal(rng, (2, 4, 16, 16, 3)), rng)


def test_vit_3d(rng):
    m = V.ViT3D(image_size=16, image_patch_size=8, frames=4, frame_patch_size=2,
                num_classes=10, dim=32, depth=1, heads=2, mlp_dim=64)
    _check(m, jax.random.normal(rng, (2, 4, 16, 16, 3)), rng)


@pytest.mark.parametrize("pool", ["cls", "mean"])
def test_vivit(rng, pool):
    m = V.ViViT(image_size=16, image_patch_size=8, frames=4, frame_patch_size=2,
                num_classes=10, dim=32, spatial_depth=1, temporal_depth=1,
                heads=2, mlp_dim=64, pool=pool)
    _check(m, jax.random.normal(rng, (2, 4, 16, 16, 3)), rng)


def test_patch_dropout_variants(rng):
    img = jax.random.normal(rng, (2, 32, 32, 3))
    m = V.ViTWithPatchDropout(image_size=32, patch_size=8, num_classes=10,
                              dim=32, depth=1, heads=2, mlp_dim=64,
                              patch_dropout=0.5)
    _check(m, img, rng, train=True)
    m2 = V.SimpleViTWithPatchDropout(image_size=32, patch_size=8, num_classes=10,
                                     dim=32, depth=1, heads=2, mlp_dim=64,
                                     patch_dropout=0.5)
    _check(m2, img, rng, train=True)


def test_patch_merger(rng):
    img = jax.random.normal(rng, (2, 32, 32, 3))
    m = V.ViTWithPatchMerger(image_size=32, patch_size=8, num_classes=10,
                             dim=32, depth=4, heads=2, mlp_dim=64,
                             patch_merge_num_tokens=4)
    v = _check(m, img, rng)
    # merger reduces tokens → attention after merge runs on 4 tokens
    pm = V.PatchMerger(32, 4)
    x = jax.random.normal(rng, (2, 16, 32))
    pv = pm.init(rng, x)
    assert pm.apply(pv, x).shape == (2, 4, 32)


def test_parallel_vit(rng):
    m = V.ParallelViT(image_size=32, patch_size=8, num_classes=10, dim=32,
                      depth=1, heads=2, mlp_dim=64, num_parallel_branches=2)
    _check(m, jax.random.normal(rng, (2, 32, 32, 3)), rng)


def test_small_dataset_vit(rng):
    m = V.SmallDatasetViT(image_size=32, patch_size=8, num_classes=10, dim=32,
                          depth=1, heads=2, mlp_dim=64)
    _check(m, jax.random.normal(rng, (2, 32, 32, 3)), rng)


def test_efficient_shell(rng):
    from noise_robust_vit_tpu.models.layers import Transformer

    inner = Transformer(32, 1, 2, 16, 64)
    m = V.EfficientViT(image_size=32, patch_size=8, num_classes=10, dim=32,
                       transformer=inner)
    _check(m, jax.random.normal(rng, (2, 32, 32, 3)), rng)


def test_learnable_memory_adapter(rng):
    vit = V.LearnableMemoryViT(image_size=32, patch_size=8, num_classes=10,
                               dim=32, depth=2, heads=2, mlp_dim=64)
    img = jax.random.normal(rng, (2, 32, 32, 3))
    vv = vit.init(rng, img)
    assert vit.apply(vv, img).shape == (2, 10)
    adapter = V.Adapter(vit=vit, num_memories_per_layer=4, num_classes=3)
    av = adapter.init(rng, img)
    out = adapter.apply(av, img)
    assert out.shape == (2, 3)
    # adapter's ViT params match the host's structure (frozen backbone)
    assert "vit" in av["params"]
    assert "memories_per_layer" in av["params"]
    assert av["params"]["memories_per_layer"].shape == (2, 4, 32)


class TestHierarchical:
    def test_max_vit(self, rng):
        from noise_robust_vit_tpu.models import MaxViT

        m = MaxViT(num_classes=10, dim=16, depth=(1, 1), dim_head=8,
                   window_size=4, dropout=0.0)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()
        # robust variant + train mode (BN)
        m2 = MaxViT(num_classes=10, dim=16, depth=(1,), dim_head=8,
                    window_size=4, robust=True)
        v2 = m2.init({"params": rng}, x)
        out2, _ = m2.apply(v2, x, deterministic=False, mutable=["batch_stats"],
                           rngs={"dropout": rng})
        assert np.isfinite(np.asarray(out2)).all()

    def test_t2t(self, rng):
        from noise_robust_vit_tpu.models import T2TViT

        m = T2TViT(image_size=32, num_classes=10, dim=32, depth=1, heads=2,
                   mlp_dim=64, t2t_layers=((3, 2), (3, 2)))
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        assert m.apply(v, x).shape == (2, 10)

    def test_pit(self, rng):
        from noise_robust_vit_tpu.models import PiT

        m = PiT(image_size=32, patch_size=8, num_classes=10, dim=16,
                depth=(1, 1), heads=2, mlp_dim=32, dim_head=8)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        assert m.apply(v, x).shape == (2, 10)

    def test_cvt(self, rng):
        from noise_robust_vit_tpu.models import CvT

        m = CvT(num_classes=10, s1_emb_dim=16, s2_emb_dim=24, s3_emb_dim=32,
                s1_depth=1, s2_depth=1, s3_depth=1)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()

    def test_cross_vit(self, rng):
        from noise_robust_vit_tpu.models import CrossViT

        m = CrossViT(image_size=32, num_classes=10, sm_dim=24, lg_dim=32,
                     sm_patch_size=4, lg_patch_size=8, sm_enc_depth=1,
                     lg_enc_depth=1, sm_enc_heads=2, lg_enc_heads=2,
                     sm_enc_mlp_dim=48, lg_enc_mlp_dim=64, cross_attn_depth=1,
                     cross_attn_heads=2, depth=1)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng, "dropout": rng}, x)
        assert m.apply(v, x).shape == (2, 10)

    def test_cct(self, rng):
        from noise_robust_vit_tpu.models import CCT, cct_2

        m = CCT(img_size=32, embedding_dim=32, n_conv_layers=2, kernel_size=3,
                stride=1, padding=1, num_layers=2, num_heads=2, mlp_ratio=1,
                num_classes=10)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng, "dropout": rng}, x)
        assert m.apply(v, x).shape == (2, 10)
        b = cct_2(num_classes=5, image_size=32)
        assert b.num_classes == 5 and b.embedding_dim == 128

    def test_cct3d(self, rng):
        from noise_robust_vit_tpu.models import CCT3D

        m = CCT3D(img_size=16, num_frames=4, embedding_dim=32, num_layers=1,
                  num_heads=2, mlp_ratio=1, num_classes=10, kernel_size=3,
                  stride=2, padding=1)
        x = jax.random.normal(rng, (1, 4, 16, 16, 3))
        v = m.init({"params": rng, "dropout": rng}, x)
        assert m.apply(v, x).shape == (1, 10)

    def test_nest(self, rng):
        from noise_robust_vit_tpu.models import NesT

        m = NesT(image_size=32, patch_size=4, num_classes=10, dim=16, heads=2,
                 num_hierarchies=2, block_repeats=(1, 1))
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        assert m.apply(v, x).shape == (2, 10)

    def test_mobile_vit(self, rng):
        from noise_robust_vit_tpu.models import MobileViT

        m = MobileViT(
            image_size=(64, 64), dims=(16, 20, 24),
            channels=(8, 8, 12, 12, 16, 16, 24, 24, 32, 32, 64),
            num_classes=10, expansion=2, depths=(1, 1, 1),
        )
        x = jax.random.normal(rng, (2, 64, 64, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()

    def test_twins_svt(self, rng):
        from noise_robust_vit_tpu.models import TwinsSVT

        m = TwinsSVT(num_classes=10, s1_emb_dim=16, s2_emb_dim=24,
                     s3_emb_dim=32, s4_emb_dim=48, s1_depth=1, s2_depth=1,
                     s3_depth=1, s4_depth=1, s1_local_patch_size=4,
                     s1_global_k=4, s2_local_patch_size=2, s2_global_k=2,
                     s3_local_patch_size=2, s3_global_k=2, s4_global_k=1)
        x = jax.random.normal(rng, (2, 64, 64, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()


class TestFinalBatch:
    def test_ats_vit(self, rng):
        from noise_robust_vit_tpu.models import ATSViT

        m = ATSViT(image_size=32, patch_size=8, num_classes=10, dim=32,
                   depth=3, max_tokens_per_depth=(12, 8, 4), heads=2,
                   mlp_dim=64, dim_head=16)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng, "ats": rng}, x)
        out = m.apply(v, x)  # deterministic: fixed sampling keys
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()
        logits, ids = m.apply(v, x, deterministic=False,
                              rngs={"ats": rng}, return_sampled_token_ids=True)
        assert logits.shape == (2, 10)
        assert ids.shape[1] <= 13  # <= max sampled + cls boundary

    def test_sep_vit(self, rng):
        from noise_robust_vit_tpu.models import SepViT

        m = SepViT(num_classes=10, dim=16, depth=(1, 1), heads=(1, 2),
                   window_size=2, dim_head=8)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()

    def test_crossformer(self, rng):
        from noise_robust_vit_tpu.models import CrossFormer

        m = CrossFormer(dim=(16, 24, 32, 48), depth=(1, 1, 1, 1),
                        global_window_size=(4, 2, 2, 1), local_window_size=2,
                        dim_head=8, num_classes=10)
        x = jax.random.normal(rng, (2, 64, 64, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()

    def test_scalable_vit(self, rng):
        from noise_robust_vit_tpu.models import ScalableViT

        m = ScalableViT(num_classes=10, dim=16, depth=(1, 1), heads=(1, 2),
                        reduction_factor=(2, 1), window_size=(4, 2),
                        ssa_dim_key=8, ssa_dim_value=8, iwsa_dim_key=8,
                        iwsa_dim_value=8)
        x = jax.random.normal(rng, (2, 64, 64, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()

    def test_regionvit(self, rng):
        from noise_robust_vit_tpu.models import RegionViT

        m = RegionViT(dim=(16, 24, 32, 48), depth=(1, 1, 1, 1), window_size=2,
                      local_patch_size=4, num_classes=10, use_peg=True)
        x = jax.random.normal(rng, (2, 64, 64, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()

    def test_local_vit(self, rng):
        from noise_robust_vit_tpu.models import LocalViT

        m = LocalViT(image_size=32, patch_size=8, num_classes=10, dim=32,
                     depth=1, heads=2, mlp_dim=64)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        assert m.apply(v, x).shape == (2, 10)

    @pytest.mark.parametrize("use_rotary,use_ds_conv,use_glu",
                             [(True, True, True), (False, False, False)])
    def test_rvt(self, rng, use_rotary, use_ds_conv, use_glu):
        from noise_robust_vit_tpu.models import RvT

        m = RvT(image_size=32, patch_size=8, num_classes=10, dim=32, depth=1,
                heads=2, mlp_dim=64, dim_head=16, use_rotary=use_rotary,
                use_ds_conv=use_ds_conv, use_glu=use_glu)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init({"params": rng}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()
