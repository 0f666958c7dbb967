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
        lr_scaling=1.0, wd_scaling=1.0, projector_depth=0,
        projector_width=64,
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
    def test_projector_mlp(self, tmp_path):
        # --projector-depth > 0: BN'd MLP ahead of the instance classifier
        # (ref simpler_randomlabel.py:136-155); exercises the mutable
        # batch_stats merge for the extra_classifier collection
        from simpler_randomlabel import Model

        args = _diet_args(
            tmp_path / "proj", architecture=_tiny_arch(), max_indices=64,
            projector_depth=2, projector_width=32,
        )
        m = Model(args)
        m()
        assert len(m.logger.read("eval_accuracies")) == 1
        state = jax.device_get(m.state)
        assert "extra_classifier" in state.model_state.get("batch_stats", {})

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


EXAMPLES = Path(__file__).resolve().parent.parent / "examples"

# one-cell env overrides per executor: tiny grids, synthetic data, 1 epoch
# (VERDICT item 8: "test_sweeps asserts the grids parse and one cell of each
# runs on synthetic"; ref executor_*.sh)
_CELL = {
    "executor_CIFAR.sh": {
        "EPOCHS": "1", "ARCHS": "vit_tiny_test", "DATASET": "synthetic"},
    "executor_DA.sh": {"EPOCHS": "1"},
    "executor_SMALL_DATASETS.sh": {"EPOCHS": "1"},
    "executor_noise.sh": {"EPOCHS": "1"},
    "executor_IN.sh": {
        "EPOCHS_GRID": "1", "ARCHS": "vit_tiny_test", "LS_GRID": "0.1",
        "SCALING_GRID": "1.0", "DATASETS": "synthetic", "BS": "256"},
    "executor_baseline.sh": {
        "EPOCHS": "1", "DRAWS": "1", "ARCH": "vit_tiny_test",
        "DATASET": "synthetic", "SEED": "3"},
    "executor_epochs_CV.sh": {
        "EPOCHS_GRID": "1", "ARCHS": "vit_tiny_test", "DATASET": "synthetic",
        "BS": "256"},
    "executor_lsmoothing_CV.sh": {
        "EPOCHS": "1", "ARCHS": "vit_tiny_test", "LS_GRID": "0.1",
        "DATASET": "synthetic", "BS": "256"},
    "executor_BS_CV.sh": {
        "EPOCHS": "1", "ARCH": "vit_tiny_test", "BS_GRID": "256",
        "DATASET": "synthetic"},
    "executor_epochs_evaluate.sh": {
        "EPOCHS": "1", "ARCH": "vit_tiny_test", "DATASETS": "synthetic"},
    "executor_grouped.sh": {
        "EPOCHS": "1", "CONV_ARCHS": "vit_tiny_test", "VIT_ARCHS": "",
        "DATASET": "synthetic", "BS": "256", "CLUSTERS": "8",
        "PROJ_DIM": "64"},
    "executor_many.sh": {
        "EPOCHS": "1", "ARCH": "vit_tiny_test", "SIZES": "2",
        "DATASET": "synthetic", "BS": "256"},
    "executor_sup_ssl.sh": {
        "EPOCHS": "1", "ARCH": "vit_tiny_test", "TEMPS": "0.1",
        "DATASET": "synthetic", "BS": "256"},
    "executor_arch.sh": {
        "EPOCHS": "1", "CONV_ARCHS": "", "TRANS_ARCHS": "vit_tiny_test",
        "DATASET": "synthetic", "BS": "64"},
    "alberto.sh": {"EPOCHS": "1"},
}


class TestExecutors:
    def test_every_reference_executor_has_an_equivalent(self):
        # the 12 reference executor_*.sh all map to a named local script
        # (DA covers the reference's data-augmentation strength sweeps)
        ours = {p.name for p in EXAMPLES.glob("executor_*.sh")}
        for name in ("IN", "CIFAR", "DA", "SMALL_DATASETS", "baseline",
                     "BS_CV", "epochs_CV", "epochs_evaluate", "grouped",
                     "lsmoothing_CV", "many", "sup_ssl", "arch"):
            assert f"executor_{name}.sh" in ours, name
        # plus the trivial local launcher (ref examples/alberto.sh)
        assert (EXAMPLES / "alberto.sh").exists()

    @pytest.mark.parametrize("script", sorted(_CELL))
    def test_grid_parses(self, script):
        subprocess.run(["bash", "-n", str(EXAMPLES / script)], check=True)

    @pytest.mark.slow
    @pytest.mark.parametrize(
        "script",
        ["executor_IN.sh", "executor_baseline.sh", "executor_epochs_CV.sh",
         "executor_lsmoothing_CV.sh", "executor_BS_CV.sh",
         "executor_epochs_evaluate.sh", "executor_grouped.sh",
         "executor_many.sh", "executor_sup_ssl.sh", "executor_arch.sh",
         "alberto.sh"],
    )
    def test_one_cell_runs_on_synthetic(self, tmp_path, script):
        import os

        env = dict(os.environ, FOLDER=str(tmp_path), JAX_PLATFORMS="cpu",
                   XLA_FLAGS="", **_CELL[script])
        proc = subprocess.run(
            ["bash", str(EXAMPLES / script)], env=env, capture_output=True,
            text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        hparams = list(tmp_path.rglob("hparams.json"))
        assert hparams, "no run folder produced"
        logs = list(tmp_path.rglob("train_log.jsonl"))
        assert logs and all(l.stat().st_size > 0 for l in logs)


class TestReaderPresets:
    def _runs(self, folder, grid):
        for i, hp in enumerate(grid):
            d = folder / f"run{i}"
            d.mkdir(parents=True)
            (d / "hparams.json").write_text(json.dumps(hp))
            rows = [{"accus": 0.1 * i + 0.05 * j} for j in range(3)]
            (d / "eval_accuracies.jsonl").write_text(
                "\n".join(json.dumps(r) for r in rows) + "\n"
            )

    def test_scaling_pivot(self, tmp_path, capsys):
        import reader

        self._runs(tmp_path, [
            {"lr_scaling": s1, "wd_scaling": s2}
            for s1 in (1.0, 10.0) for s2 in (1.0, 1000.0)
        ])
        args = SimpleNamespace(
            preset="scaling", folder=tmp_path, group_by=None, cols_by=None,
            metric=None, log=None, top=20, plot=None, verbose=False)
        rkeys, ckeys, table = reader.main(args)
        assert rkeys == [1.0, 10.0] and ckeys == [1.0, 1000.0]
        # best accus of run i = 0.1*i + 0.10
        np.testing.assert_allclose(
            table, [[0.10, 0.20], [0.30, 0.40]], atol=1e-9)
        assert "lr_scaling" in capsys.readouterr().out

    def test_pivot_tolerates_runs_missing_the_hparam(self, tmp_path, capsys):
        """A sweep folder containing one run WITHOUT the grouped hparam must
        not crash the reader on a mixed float/str key sort (round-2 advisor
        finding): the '?' bucket sorts after the numeric keys."""
        import reader

        self._runs(tmp_path, [
            {"lr_scaling": 1.0, "wd_scaling": 1.0},
            {"lr_scaling": 10.0, "wd_scaling": 1.0},
            {"wd_scaling": 1.0},  # no lr_scaling recorded
        ])
        args = SimpleNamespace(
            preset="scaling", folder=tmp_path, group_by=None, cols_by=None,
            metric=None, log=None, top=20, plot=None, verbose=False)
        rkeys, ckeys, table = reader.main(args)
        assert rkeys == [1.0, 10.0, "?"]
        assert table.shape == (3, 1)

    def test_bs_cv_line_plot(self, tmp_path):
        import reader

        self._runs(tmp_path, [{"batch_size": b} for b in (8, 256, 64)])
        out = tmp_path / "fig.png"
        args = SimpleNamespace(
            preset="BS_CV", folder=tmp_path, group_by=None, cols_by=None,
            metric=None, log=None, top=20, plot=out, verbose=False)
        rkeys, _, table = reader.main(args)
        assert rkeys == [8.0, 64.0, 256.0]  # numeric sort, not lexicographic
        assert out.exists() and out.stat().st_size > 0

    def test_baseline_leaderboard(self, tmp_path, capsys):
        import reader

        self._runs(tmp_path, [
            {"architecture": "a", "loss": "ce"},
            {"architecture": "b", "loss": "sboot"},
        ])
        args = SimpleNamespace(
            preset="baseline", folder=tmp_path, group_by=None, cols_by=None,
            metric=None, log=None, top=1, plot=None, verbose=False)
        scored = reader.main(args)
        assert [round(s, 2) for s, _ in scored] == [0.20, 0.10]
        out = capsys.readouterr().out
        assert "sboot" in out and out.index("0.2000") < out.index("best") + 500


class TestImageFolderExperiments:
    @pytest.mark.slow
    def test_diet_trains_from_jpeg_folder(self, tmp_path):
        """Experiment scripts consume ImageFolder trees through make_loader
        (the FFCV-path role, ref randomlabel.py:72-78): DIET runs end-to-end
        on a folder of JPEGs, including the grouping npz flow."""
        import cv2

        from noise_robust_vit_tpu.train.image_data import ImageFolderLoader

        root = tmp_path / "data"
        arr = np.random.default_rng(0)
        for split, per in (("train", 16), ("val", 8)):
            for c in range(2):
                d = root / split / f"class_{c}"
                d.mkdir(parents=True)
                for i in range(per):
                    cv2.imwrite(str(d / f"{i}.jpg"),
                                arr.integers(0, 255, (40, 40, 3), np.uint8))

        import build_grouping
        from simpler_randomlabel import Model

        bg = SimpleNamespace(dataset="synthetic", dataset_path=root,
                             batch_size=12, proj_dim=16, clusters=[4],
                             niter=3, seed=0, output=tmp_path)
        build_grouping.main(bg)
        npz = np.load(tmp_path / "randomproj_16_grouped_4.npz")
        assert len(npz["indices"]) == 32  # every sample grouped, incl. tail

        args = _diet_args(tmp_path / "run", architecture=_tiny_arch(),
                          dataset_path=root, batch_size=8,
                          indices_from=tmp_path / "randomproj_16_grouped_4.npz")
        m = Model(args)
        m()
        assert isinstance(m.train_loader, ImageFolderLoader)
        assert len(m.logger.read("eval_accuracies")) == 1
