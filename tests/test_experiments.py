"""Experiment-layer (L3) tests: nowak partial-sync training, randomlabel
losses + tripwires, sup_ssl VICReg loss, probes, retrieval utilities."""

import sys
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from noise_robust_vit_tpu import datasets, models
from noise_robust_vit_tpu.ops.norms import PartialBatchNorm, partial_relu



def _register_tiny_resnet():
    from noise_robust_vit_tpu.models.factory import _REGISTRY
    from noise_robust_vit_tpu.models.resnet import ResNet

    if "tiny_resnet_test" not in _REGISTRY:
        def build(*, num_classes=10, image_size=32, robust=False, norm="batch",
                  dtype=None, **kw):
            import jax.numpy as jnp
            kw.pop("relu_dropout", None)
            return ResNet(stage_sizes=(1, 1), block="basic", width=8,
                          num_classes=num_classes, norm=norm,
                          dtype=dtype or jnp.float32)
        _REGISTRY["tiny_resnet_test"] = build
    return "tiny_resnet_test"

def _base_args(tmp_path, **kw):
    base = dict(
        folder=tmp_path, epochs=1, batch_size=16, learning_rate=1e-3,
        weight_decay=0.01, beta1=0.9, beta2=0.999, grad_max_norm=5.0,
        optimizer="adamw", scheduler="warmup_cosine", label_smoothing=0.0,
        float16=False, sync_batchnorm=True, eval_each_epoch=True,
        checkpoint_frequency=0, save_final_model=False, seed=0,
        dataset="synthetic", dataset_path=None, num_workers=0,
    )
    base.update(kw)
    return SimpleNamespace(**base)


class TestPartialOps:
    def test_partial_relu_mask_shared(self):
        x = jnp.array([[1.0], [-1.0], [-5.0], [5.0]])  # halves: [1,-1], [-5,5]
        out = partial_relu(x)
        # mask from first half: [True, False]; applied to both halves
        np.testing.assert_allclose(np.asarray(out).ravel(), [1.0, 0.0, -5.0, 0.0])

    def test_partial_bn_second_half_uses_first_stats(self, rng):
        bn = PartialBatchNorm()
        first = jax.random.normal(rng, (8, 4, 4, 3)) * 3 + 1
        second = jax.random.normal(jax.random.fold_in(rng, 1), (8, 4, 4, 3))
        x = jnp.concatenate([first, second])
        v = bn.init(rng, x, deterministic=False)
        out, _ = bn.apply(v, x, deterministic=False, mutable=["batch_stats"])
        f, s = out[:8], out[8:]
        # first half standard-normalized
        np.testing.assert_allclose(float(f.mean()), 0.0, atol=1e-4)
        # second half normalized with FIRST-half stats: mean(second)≈0 but
        # normalized by first's mean/std → shifted
        mean1 = first.mean(axis=(0, 1, 2))
        std1 = jnp.sqrt(
            (first**2).mean(axis=(0, 1, 2)) - mean1**2 + 1e-5
        )
        expected = (second - mean1) / std1
        np.testing.assert_allclose(np.asarray(s), np.asarray(expected), atol=1e-4)


class TestResNet:
    def test_forward_and_features(self, rng):
        m = models.resnet18(num_classes=7)
        x = jax.random.normal(rng, (2, 32, 32, 3))
        v = m.init(rng, x)
        assert m.apply(v, x).shape == (2, 7)
        assert m.apply(v, x, return_features=True).shape == (2, 512)

    def test_partial_norm_variant(self, rng):
        m = models.resnet18(num_classes=7, norm="partial")
        x = jax.random.normal(rng, (4, 32, 32, 3))
        v = m.init(rng, x, deterministic=False)
        out, _ = m.apply(v, x, deterministic=False, mutable=["batch_stats"])
        assert out.shape == (4, 7)


class TestRandomLabel:
    def test_instance_losses(self, rng):
        from randomlabel import instance_loss

        logits = jax.random.normal(rng, (8, 32))
        z = jnp.arange(8)
        vals = {}
        for name in ("ce", "sce", "l2", "bce", "l1", "sboot"):
            v = float(instance_loss(name, logits, z, 32, label_smoothing=0.1))
            assert np.isfinite(v), name
            vals[name] = v
        assert vals["l2"] != vals["ce"]

    def test_tripwire(self):
        from randomlabel import AccuracyFloorError, check_floor

        with pytest.raises(AccuracyFloorError):
            check_floor("CIFAR10", 19, 0, 0.10, 100)
        check_floor("CIFAR10", 19, 0, 0.50, 100)  # above floor: no raise
        check_floor("CIFAR10", 19, 0, 0.10, 200)  # >100 epochs: disabled
        check_floor("synthetic", 19, 0, 0.0, 100)  # unknown dataset: no-op

    def test_subset_indices(self):
        from randomlabel import subset_indices

        labels = np.repeat(np.arange(4), 8)
        idx = subset_indices(labels, 0.5, stratify=True, seed=0)
        assert len(idx) == 16
        sub = labels[idx]
        assert all((sub == c).sum() == 4 for c in range(4))

    @pytest.mark.slow
    def test_end_to_end(self, tmp_path):
        from randomlabel import Model

        args = _base_args(
            tmp_path, architecture=_register_tiny_resnet(), loss="ce", beta=0.9, proba=0.1,
            strength=0, percentage=0.5, stratify=False, projector_depth=0,
            projector_width=64, epochs=1, batch_size=16,
        )
        m = Model(args)
        m()
        evals = m.logger.read("eval_accuracies")
        assert len(evals) == 1 and "accus5" in evals[0]


class TestSupSSL:
    def test_vicreg_loss_components(self, rng):
        from sup_ssl import vicreg_sup_loss

        z = jax.random.normal(rng, (16, 8))
        labels = jnp.array([0] * 8 + [1] * 8)
        loss = float(vicreg_sup_loss(z, labels, 1.0))
        assert np.isfinite(loss) and loss > 0
        # identical same-label features → zero invariance part
        z2 = jnp.tile(jax.random.normal(rng, (2, 8)), (8, 1)).reshape(16, 8)
        z2 = jnp.concatenate([jnp.tile(z2[:1], (8, 1)), jnp.tile(z2[1:2], (8, 1))])
        l_only_vc = float(vicreg_sup_loss(z2, labels, 0.0))
        l_with_inv = float(vicreg_sup_loss(z2, labels, 100.0))
        np.testing.assert_allclose(l_only_vc, l_with_inv, rtol=1e-5)

    @pytest.mark.slow
    def test_end_to_end(self, tmp_path):
        from sup_ssl import Model

        args = _base_args(
            tmp_path, architecture=_register_tiny_resnet(), temperature=1.0, strength=0,
            epochs=1, batch_size=16,
        )
        m = Model(args)
        m()
        assert len(m.logger.read("eval_accuracies")) == 1


class TestNowak:
    @pytest.mark.slow
    def test_end_to_end(self, tmp_path):
        from nowak import Model

        args = _base_args(
            tmp_path, architecture=_register_tiny_resnet(), improved=False,
            dataset="synthetic", strength=1, noise_std=0.1,
            epochs=1, batch_size=16,
        )
        m = Model(args)
        m()
        evals = m.logger.read("eval_accuracies")
        assert len(evals) == 1 and 0 <= evals[0]["accus"] <= 1


class TestEvaluationUtilities:
    def test_pca_whitening(self, rng):
        from noise_robust_vit_tpu.evaluation import PCAWhitening

        X = np.random.default_rng(0).normal(size=(200, 16)) * [10] * 8 + [1] * 16
        p = PCAWhitening(dim=8).train(X)
        Y = p.apply(X)
        assert Y.shape == (200, 8)
        np.testing.assert_allclose(Y.mean(0), 0, atol=1e-8)
        np.testing.assert_allclose(np.cov(Y.T), np.eye(8), atol=0.2)

    def test_gem_pool(self, rng):
        from noise_robust_vit_tpu.evaluation import gem_pool

        t = jax.random.uniform(rng, (2, 10, 8)) + 0.1
        g = gem_pool(t, p=1.0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(t.mean(1)), atol=1e-5)

    def test_compute_ap_perfect(self):
        from noise_robust_vit_tpu.evaluation import compute_ap

        assert compute_ap(np.array([0, 1, 2]), 3) == pytest.approx(1.0)
        assert compute_ap(np.array([]), 0) == 0.0

    def test_compute_map_with_junk(self):
        from noise_robust_vit_tpu.evaluation import compute_map

        # 5 db items, 1 query; ranks column: [0(junk),1(ok),2,3(ok),4]
        ranks = np.array([[0], [1], [2], [3], [4]])
        gnd = [{"ok": np.array([1, 3]), "junk": np.array([0])}]
        mAP, _, _ = compute_map(ranks, gnd)
        # after junk removal ok items sit at ranks 0 and 2
        expected = ((1.0 + 1.0) / 2 + (1 / 2 + 2 / 3) / 2) / 2
        assert mAP == pytest.approx(expected)

    def test_copydays_eval_constructed_ground_truth(self):
        """Per-block mAP on hand-constructed rankings
        (ref evaluate_copy_detection.py:184-211)."""
        from noise_robust_vit_tpu.evaluation import copydays_eval

        # Holidays trapezoid AP for a single positive at rank r:
        # (precision_0 + precision_1)/2 = ([r==0] + 1/(r+1))/2
        # → rank 0: 1.0, rank 1: 0.25, rank 2: 1/6
        ids = np.array([
            [0, 9, 8], [1, 9, 8], [9, 2, 8],
            # block 'strong': 2 queries matching originals by 4-char prefix
            [0, 9, 8],          # positive {0} at rank 0 → AP 1.0
            [9, 8, 1],          # positive {1} at rank 2 → AP 1/6
        ])
        originals = ["200000.jpg", "200100.jpg", "200200.jpg"]
        strongs = ["200000_a.jpg", "200100_a.jpg"]
        out = copydays_eval(
            ids, ["original", "strong"], [3, 2], originals, strongs
        )
        assert out["original"] == pytest.approx((1.0 + 1.0 + 0.25) / 3)
        assert out["strong"] == pytest.approx((1.0 + 1 / 6) / 2)

    @pytest.mark.slow
    def test_copy_detection_pipeline(self, tmp_path):
        import evaluate_copy_detection as cd

        args = SimpleNamespace(
            architecture="simple_vit", dataset="synthetic",
            copydays_path=None, distractors_path=None, whitening_path=None,
            checkpoint=None, batch_size=32, topk=10, folder=tmp_path,
        )
        res = cd.main(args)
        per_block = res["per_block_mAP"]
        # synthetic tree has these blocks
        for name in ("original", "strong", "jpegqual/75", "crops/80"):
            assert name in per_block
            assert 0.0 <= per_block[name] <= 1.0
        # original queries ARE the database images: identical features ⇒
        # rank-0 hits ⇒ perfect mAP even with random weights
        assert per_block["original"] > 0.95
        # JSON artifact written
        assert (tmp_path / "copy_detection.json").exists()

    @pytest.mark.slow
    def test_image_retrieval_pipeline(self, tmp_path):
        import evaluate_image_retrieval as ir

        args = SimpleNamespace(
            architecture="simple_vit", dataset="synthetic", dataset_path=None,
            checkpoint=None, batch_size=32, folder=tmp_path,
        )
        res = ir.main(args)
        assert 0.0 <= res["mAP_medium"] <= 1.0
