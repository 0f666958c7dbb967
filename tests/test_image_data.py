"""Real-image ingestion tests: ImageFolder scan, threaded decode loader,
sharding, packed format, and get_dataset dispatch (the FFCV-role pipeline,
ref examples/randomlabel.py:72-78)."""

import numpy as np
import pytest

from noise_robust_vit_tpu import datasets
from noise_robust_vit_tpu.train.image_data import (
    ImageFolderDataset,
    ImageFolderLoader,
    PackedDataset,
    pack_image_folder,
)


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    """ImageNet-style tree: root/{train,val}/class_k/*.jpg, 3 classes × 8/4."""
    import cv2

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for split, per in (("train", 8), ("val", 4)):
        for c in range(3):
            d = root / split / f"class_{c}"
            d.mkdir(parents=True)
            for i in range(per):
                img = rng.integers(0, 255, (48 + 8 * c, 64, 3), np.uint8)
                cv2.imwrite(str(d / f"im_{i}.jpg"), img)
    return root


def test_image_folder_scan(image_tree):
    ds = ImageFolderDataset(image_tree / "train")
    assert len(ds) == 24
    assert ds.classes == ["class_0", "class_1", "class_2"]
    assert sorted(set(ds.labels.tolist())) == [0, 1, 2]
    val = ImageFolderDataset(image_tree / "val", classes=ds.classes)
    assert len(val) == 12


def test_loader_shapes_and_determinism(image_tree):
    ds = ImageFolderDataset(image_tree / "train")
    loader = ImageFolderLoader(ds, batch_size=4, image_size=32, train=True,
                               seed=3, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 6
    for b in batches:
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["image"].dtype == np.uint8
        assert b["label"].shape == (4,)
        assert (ds.labels[b["index"]] == b["label"]).all()
    # same epoch → identical batches (deterministic crops + order)
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])
    # new epoch → different order
    loader.set_epoch(1)
    shifted = list(loader)
    assert not np.array_equal(batches[0]["index"], shifted[0]["index"])


def test_loader_sharding_disjoint(image_tree):
    ds = ImageFolderDataset(image_tree / "train")
    shards = [
        ImageFolderLoader(ds, batch_size=3, image_size=16, train=True,
                          seed=0, shard=(r, 2), num_workers=2)
        for r in range(2)
    ]
    seen = [np.concatenate([b["index"] for b in s]) for s in shards]
    assert len(seen[0]) == len(seen[1]) == 12  # equalized shard lengths
    assert not set(seen[0]) & set(seen[1])


def test_val_center_crop(image_tree):
    ds = ImageFolderDataset(image_tree / "val")
    loader = ImageFolderLoader(ds, batch_size=4, image_size=32, train=False,
                               num_workers=2)
    b = next(iter(loader))
    assert b["image"].shape == (4, 32, 32, 3)
    # val path is deterministic regardless of epoch
    loader.set_epoch(5)
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b["image"], b2["image"])


def test_tinyimagenet_layout(tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    for c in ("n01", "n02"):
        d = tmp_path / "train" / c / "images"
        d.mkdir(parents=True)
        for i in range(3):
            cv2.imwrite(str(d / f"{c}_{i}.JPEG"),
                        rng.integers(0, 255, (64, 64, 3), np.uint8))
    vd = tmp_path / "val" / "images"
    vd.mkdir(parents=True)
    lines = []
    for i, c in enumerate(["n01", "n02", "n01"]):
        name = f"val_{i}.JPEG"
        cv2.imwrite(str(vd / name), rng.integers(0, 255, (64, 64, 3), np.uint8))
        lines.append(f"{name}\t{c}\t0\t0\t32\t32")
    (tmp_path / "val" / "val_annotations.txt").write_text("\n".join(lines))

    train = ImageFolderDataset(tmp_path / "train")
    assert len(train) == 6 and train.classes == ["n01", "n02"]
    val = ImageFolderDataset(tmp_path / "val", classes=train.classes)
    assert len(val) == 3
    assert val.labels.tolist() == [0, 1, 0]


def test_pack_roundtrip_and_dispatch(image_tree, tmp_path):
    out = pack_image_folder(image_tree / "train", tmp_path / "packed",
                            image_size=24, num_workers=2)
    packed = PackedDataset(out)
    assert packed.images.shape == (24, 24, 24, 3)
    assert packed.images.dtype == np.uint8
    assert (packed.labels == ImageFolderDataset(image_tree / "train").labels).all()

    # get_dataset dispatch: image folder root → ImageFolderDataset
    ds = datasets.get_dataset(image_tree, "train")
    assert isinstance(ds, ImageFolderDataset)
    ds_val = datasets.get_dataset(image_tree, "val")
    assert isinstance(ds_val, ImageFolderDataset) and len(ds_val) == 12
    # packed dir → PackedDataset
    ds_p = datasets.get_dataset(tmp_path / "packed", "train")
    assert isinstance(ds_p, PackedDataset)


def test_make_loader_dispatch(image_tree):
    from noise_robust_vit_tpu.train.data import DataLoader, make_loader

    ds = ImageFolderDataset(image_tree / "train")
    lo = make_loader(ds, 4, train=True, image_size=16, shard=(0, 1))
    assert isinstance(lo, ImageFolderLoader)
    arr = datasets.synthetic_dataset(num_samples=64, image_size=8)
    lo2 = make_loader(arr, 4, train=True, shard=(1, 2))
    assert isinstance(lo2, DataLoader)
    assert len(lo2.indices) == 32


class TestNativeIngest:
    """C++ decode pool (native/ingest.cc) — the FFCV-native role."""

    @pytest.fixture(scope="class")
    def native(self):
        from noise_robust_vit_tpu.train.native import (
            NativeDecodePool,
            native_available,
        )

        if not native_available():
            pytest.skip("native ingest library not buildable here")
        pool = NativeDecodePool(2)
        yield pool
        pool.close()

    def test_val_decode_matches_python_path(self, native, image_tree):
        from noise_robust_vit_tpu.train.image_data import _center_crop, _decode

        ds = ImageFolderDataset(image_tree / "val")
        imgs, status = native.decode_batch(ds.paths, 32, False)
        assert imgs.shape == (len(ds), 32, 32, 3) and imgs.dtype == np.uint8
        assert (status == 0).all()
        ref = np.stack([_center_crop(_decode(p), 32) for p in ds.paths])
        diff = np.abs(ref.astype(np.int16) - imgs.astype(np.int16))
        # same geometry; bilinear implementations differ by ~1 gray level
        assert diff.mean() < 3.0

    def test_train_decode_deterministic_per_key(self, native, image_tree):
        ds = ImageFolderDataset(image_tree / "train")
        keys = np.arange(len(ds), dtype=np.uint64) + 11
        a, sa = native.decode_batch(ds.paths, 32, True, keys)
        b, _ = native.decode_batch(ds.paths, 32, True, keys)
        np.testing.assert_array_equal(a, b)
        assert (sa == 0).all()
        c, _ = native.decode_batch(ds.paths, 32, True, keys + 1)
        assert not np.array_equal(a, c)

    def test_non_jpeg_flagged_for_fallback(self, native, tmp_path):
        bad = tmp_path / "not_a_jpeg.jpg"
        bad.write_bytes(b"PNG-ish garbage")
        imgs, status = native.decode_batch([bad], 32, False)
        assert status[0] != 0

    def test_loader_uses_native_with_fallback(self, image_tree, tmp_path):
        import cv2
        import shutil

        from noise_robust_vit_tpu.train.native import native_available

        if not native_available():
            pytest.skip("native ingest library not buildable here")
        # copy tree and add a PNG (native flags it; OpenCV fallback decodes)
        root = tmp_path / "train"
        shutil.copytree(image_tree / "train", root)
        png_dir = root / "class_0"
        img = np.random.default_rng(5).integers(0, 255, (40, 40, 3), np.uint8)
        cv2.imwrite(str(png_dir / "extra.png"), img)
        ds = ImageFolderDataset(root)
        loader = ImageFolderLoader(ds, batch_size=5, image_size=32,
                                   train=False, shuffle=False, num_workers=2)
        assert loader._native is not None
        batches = list(loader)
        assert len(batches) == len(ds) // 5
        for b in batches:
            assert b["image"].shape == (5, 32, 32, 3)
            assert b["image"].std() > 0  # every slot actually decoded


def test_eval_loader_keeps_partial_tail(image_tree):
    """Eval loaders must see EVERY sample (DataLoader drop_last=False
    semantics); only training keeps strictly static shapes."""
    ds = ImageFolderDataset(image_tree / "val")  # 12 samples
    loader = ImageFolderLoader(ds, batch_size=5, image_size=32, train=False,
                               num_workers=2)
    batches = list(loader)
    assert [len(b["image"]) for b in batches] == [5, 5, 2]
    seen = np.concatenate([b["index"] for b in batches])
    assert sorted(seen.tolist()) == list(range(12))
    # training still drops the ragged tail
    tloader = ImageFolderLoader(ds, batch_size=5, image_size=32, train=True,
                                num_workers=2)
    assert [len(b["image"]) for b in tloader] == [5, 5]


def test_eval_shards_equalized(image_tree):
    """Multi-host eval shards must yield identical batch counts and tail
    shapes even when N % world != 0, or the global-batch assembly deadlocks
    (round-2 advisor finding): shorter shards pad by repeating their own
    head samples, DistributedSampler-style. 12 samples over 5 hosts →
    every shard sees ceil(12/5)=3 samples and one [3,...] batch."""
    ds = ImageFolderDataset(image_tree / "val")  # 12 samples
    world = 5
    shards = [
        ImageFolderLoader(ds, batch_size=4, image_size=16, train=False,
                          shard=(r, world), num_workers=2)
        for r in range(world)
    ]
    all_batches = [list(s) for s in shards]
    counts = [len(bs) for bs in all_batches]
    assert counts == [len(shards[0])] * world  # identical step counts
    shapes = [[b["image"].shape for b in bs] for bs in all_batches]
    assert all(s == shapes[0] for s in shapes)  # identical tail shapes
    # every sample still evaluated at least once
    seen = np.concatenate([b["index"] for bs in all_batches for b in bs])
    assert set(seen.tolist()) == set(range(12))


def test_train_crop_keys_distinct_across_epochs(image_tree):
    """The per-sample crop RNG must not collide across (epoch, index) pairs
    (round-2 advisor finding: additive key composition repeated crops in
    consecutive epochs)."""
    from noise_robust_vit_tpu.train.image_data import _epoch_key_base

    seed = 7
    keys = set()
    n_idx = 1_000_005  # spans the old additive collision offset (1000003)
    for epoch in range(3):
        base = _epoch_key_base(seed, epoch)
        for idx in (0, 1, 2, n_idx - 2, n_idx - 1):
            keys.add(base ^ idx)
    assert len(keys) == 15  # all distinct
