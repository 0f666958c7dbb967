"""L4 layer tests: k-means, build_grouping, DIET modes, relauncher/reader,
SSL pretraining driver."""

import json
import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from noise_robust_vit_tpu.ops.kmeans import kmeans, kmeans_assign


class TestKMeans:
    def test_separable_clusters(self, rng):
        k1, k2 = jax.random.split(rng)
        a = jax.random.normal(k1, (50, 8)) * 0.05 + jnp.ones(8)
        b = jax.random.normal(k2, (50, 8)) * 0.05 - jnp.ones(8)
        x = jnp.concatenate([a, b])
        cents, assign = kmeans(rng, x, k=2, niter=10)
        assign = np.asarray(assign)
        # each true cluster maps to one k-means cluster
        assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
        assert assign[0] != assign[-1]
        re = kmeans_assign(x, cents)
        np.testing.assert_array_equal(np.asarray(re), assign)

    def test_spherical_centroids_normalized(self, rng):
        x = jax.random.normal(rng, (64, 8))
        cents, _ = kmeans(rng, x, k=4, niter=5, spherical=True)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(cents), axis=-1), 1.0, atol=1e-5
        )


def _diet_args(tmp_path, **kw):
    base = dict(
        folder=tmp_path, epochs=1, batch_size=16, learning_rate=1e-3,
        weight_decay=0.01, beta1=0.9, beta2=0.999, grad_max_norm=5.0,
        optimizer="adamw", scheduler="warmup_cosine", label_smoothing=0.1,
        float16=False, sync_batchnorm=True, eval_each_epoch=True,
        checkpoint_frequency=0, save_final_model=False, seed=0,
        dataset="synthetic", dataset_path=None, num_workers=0,
        architecture="simple_vit", supervised=False, clip=False,
        clip_output_dim=32, temperature=0.1, strength=0,
        max_indices=10**9, indices_seed=0, indices_from=None,
        lr_scaling=1.0, wd_scaling=1.0,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _tiny_arch():
    from noise_robust_vit_tpu.models.factory import _REGISTRY
    from noise_robust_vit_tpu.models import SimpleViT

    if "tiny4diet" not in _REGISTRY:
        _REGISTRY["tiny4diet"] = lambda num_classes, image_size, robust=False, dtype=None, **kw: SimpleViT(
            image_size=image_size, patch_size=8, num_classes=num_classes,
            dim=32, depth=1, heads=2, mlp_dim=64, robust=robust,
            dtype=dtype or jnp.float32,
        )
    return "tiny4diet"


class TestDiet:
    @pytest.mark.slow
    @pytest.mark.parametrize("mode", ["diet", "supervised", "clip"])
    def test_modes(self, tmp_path, mode):
        from simpler_randomlabel import Model

        args = _diet_args(
            tmp_path / mode, architecture=_tiny_arch(),
            supervised=(mode == "supervised"), clip=(mode == "clip"),
            max_indices=64 if mode == "diet" else 10**9,
        )
        m = Model(args)
        m()
        assert len(m.logger.read("eval_accuracies")) == 1

    @pytest.mark.slow
    def test_indices_from_grouping(self, tmp_path, rng):
        # build a grouping npz, then train DIET against cluster labels
        import build_grouping

        bg_args = SimpleNamespace(
            dataset="synthetic", dataset_path=None, batch_size=128,
            proj_dim=64, clusters=[16], niter=5, seed=0, output=tmp_path,
        )
        build_grouping.main(bg_args)
        npz = tmp_path / "randomproj_64_grouped_16.npz"
        assert npz.exists()
        d = np.load(npz)
        assert d["indices"].max() < 16

        from simpler_randomlabel import Model

        args = _diet_args(
            tmp_path / "run", architecture=_tiny_arch(), indices_from=npz
        )
        m = Model(args)
        m()
        assert m.train_samples == int(d["indices"].max() + 1)


class TestReaders:
    def test_relauncher_best_runs(self, tmp_path):
        from relauncher import best_runs

        for i, acc in enumerate([0.1, 0.9, 0.5]):
            d = tmp_path / f"run{i}"
            d.mkdir()
            (d / "hparams.json").write_text(json.dumps({"architecture": "a"}))
            (d / "eval_accuracies.jsonl").write_text(
                json.dumps({"accus": acc}) + "\n"
            )
        top = best_runs(tmp_path, top_k=2)
        assert [round(s, 1) for s, _ in top] == [0.9, 0.5]

    def test_lr_scheduler_table(self, capsys):
        import lr_scheduler

        lr_scheduler.main(total_steps=100)
        out = capsys.readouterr().out
        assert "warmup_cosine" in out

    def test_plot_grid(self, capsys):
        import plot_grid

        plot_grid.main()
        assert "diet" in capsys.readouterr().out


class TestPretrainSSL:
    @pytest.mark.slow
    @pytest.mark.parametrize("method", ["mae", "simmim", "dino"])
    def test_pretrain_one_epoch(self, tmp_path, method):
        import pretrain_ssl

        args = SimpleNamespace(
            folder=tmp_path / method, epochs=1, batch_size=16,
            learning_rate=1e-3, weight_decay=0.01, beta1=0.9, beta2=0.999,
            grad_max_norm=None, optimizer="adamw", scheduler="warmup_cosine",
            label_smoothing=0.0, float16=False, sync_batchnorm=True,
            eval_each_epoch=False, checkpoint_frequency=0,
            save_final_model=False, seed=0, dataset="synthetic",
            dataset_path=None, num_workers=0, method=method, robust=False,
            strength=0, patch_size=8, dim=32, depth=1, heads=2, mlp_dim=64,
            decoder_dim=24, decoder_depth=1, masking_ratio=0.5, dino_k=64,
        )
        (tmp_path / method).mkdir(parents=True, exist_ok=True)
        pretrain_ssl.main(args)
        from noise_robust_vit_tpu.train import RunLogger

        logs = RunLogger(tmp_path / method).read("train_log")
        assert len(logs) == 1 and np.isfinite(logs[0]["loss"])
