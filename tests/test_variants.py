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
