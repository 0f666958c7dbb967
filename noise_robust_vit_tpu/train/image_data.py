"""Real-image ingestion: folder-of-JPEG datasets with a multi-threaded decode
pool, per-process sharding, pipelined batch assembly, and a packed raw format
for hosts whose decode throughput can't feed the chip.

This is the TPU-native replacement for the reference's FFCV data path
(ref examples/randomlabel.py:72-78 ``omega.ffcv.train_reader(..., world_size)``,
ref examples/evaluation.py:28-43 ``ffcv_imagenet_train_dataset``):

  * **ImageFolderDataset** — scans ``root/split/class_x/*.jpg`` (torchvision
    ImageFolder layout, the reference's ``datasets.imagenet_*_dataset``
    intent, ref CIFAR100.py:18-21) and the TinyImageNet on-disk layout.
  * **ImageFolderLoader** — seeded per-epoch global shuffle, then
    ``order[process_index::process_count]`` sharding (the FFCV
    ``world_size``/``DistributedSampler`` role, ref CIFAR100.py:22-39);
    decode via an OpenCV thread pool (cv2 releases the GIL around libjpeg)
    with a background producer so decode of batch k+1..k+p overlaps step k;
    host does decode + random-resized-crop / center-crop to a STATIC shape,
    everything else (flip, jitter, noise, normalize) is the fused device
    stage ``augment_batch``.
  * **pack_image_folder / PackedDataset** — one-time decode of a folder into
    a raw uint8 memmap (`images.u8` + `meta.json`); reading it back is a
    memcpy, so a 1-core host can still feed a v5e chip at full step rate
    (FFCV's .beton role).
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator

import numpy as np

__all__ = [
    "IMAGE_EXTENSIONS",
    "ImageFolderDataset",
    "ImageFolderLoader",
    "PackedDataset",
    "pack_image_folder",
    "load_packed",
]

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm")


def _is_image(p: Path) -> bool:
    return p.suffix.lower() in IMAGE_EXTENSIONS


class ImageFolderDataset:
    """Lazily-decoded dataset over a torchvision-ImageFolder-style directory.

    ``root`` is the split directory (``train/`` or ``val/``) containing one
    subdirectory per class. The TinyImageNet layouts
    (``train/<cls>/images/*.JPEG`` and ``val/images`` + val_annotations.txt)
    are auto-detected. ``classes`` fixes the class→index mapping (pass the
    train split's so val labels line up).
    """

    def __init__(self, root: str | Path, classes: list[str] | None = None):
        self.root = Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(f"no image folder at {self.root}")
        paths: list[Path] = []
        labels: list[int] = []

        ann = self.root / "val_annotations.txt"
        if ann.exists():  # TinyImageNet val layout
            name_to_cls = {}
            for line in ann.read_text().splitlines():
                parts = line.split("\t")
                if len(parts) >= 2:
                    name_to_cls[parts[0]] = parts[1]
            if classes is None:
                classes = sorted(set(name_to_cls.values()))
            cls_idx = {c: i for i, c in enumerate(classes)}
            img_dir = self.root / "images"
            for p in sorted(img_dir.iterdir()):
                if _is_image(p) and p.name in name_to_cls:
                    paths.append(p)
                    labels.append(cls_idx[name_to_cls[p.name]])
        else:
            dirs = sorted(d for d in self.root.iterdir() if d.is_dir())
            if classes is None:
                classes = [d.name for d in dirs]
            cls_idx = {c: i for i, c in enumerate(classes)}
            for d in dirs:
                if d.name not in cls_idx:
                    continue
                sub = d / "images" if (d / "images").is_dir() else d  # TinyImageNet train
                for p in sorted(sub.rglob("*")):
                    if _is_image(p):
                        paths.append(p)
                        labels.append(cls_idx[d.name])
        if not paths:
            raise FileNotFoundError(f"no images under {self.root}")
        self.paths = paths
        self.labels = np.asarray(labels, np.int32)
        self.classes = classes

    def __len__(self):
        return len(self.paths)


def _epoch_key_base(seed: int, epoch: int) -> int:
    """Per-epoch RNG key base with the epoch in the HIGH 32 bits: the
    per-sample key is ``base ^ index`` (index < 2^32), so keys never collide
    across (epoch, index) pairs — the previous additive composition
    ``(seed*C1+epoch)*C2+idx`` repeated crops across consecutive epochs on
    >1M-image datasets (round-2 advisor finding). The seed is diffused
    through a splitmix64 round first."""
    z = (seed + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 31
    return (z ^ ((epoch & 0xFFFFFFFF) << 32)) & 0xFFFFFFFFFFFFFFFF


def _decode(path: Path) -> np.ndarray:
    """JPEG/PNG → RGB uint8 HWC. cv2 drops the GIL around libjpeg-turbo, so
    a ThreadPoolExecutor gives real decode parallelism (the FFCV role)."""
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:  # fall back for exotic formats
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))
        return img
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _random_resized_crop(img: np.ndarray, size: int, rng: np.random.Generator,
                         scale=(0.35, 1.0), ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """torchvision RandomResizedCrop semantics on host (the decode-stage crop
    of the FFCV train pipeline; scale floor 0.35 matches FFCV's
    RandomResizedCropRGBImageDecoder default rather than torchvision's 0.08)."""
    import cv2

    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            y0 = rng.integers(0, h - ch + 1)
            x0 = rng.integers(0, w - cw + 1)
            crop = img[y0 : y0 + ch, x0 : x0 + cw]
            return cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
    return _center_crop(img, size)


def _center_crop(img: np.ndarray, size: int, resize_ratio: float = 224 / 256) -> np.ndarray:
    """Resize shorter side to size/resize_ratio then center-crop (val path,
    ref omega.transforms ffcv_imagenet_val_dataset semantics)."""
    import cv2

    h, w = img.shape[:2]
    short = min(h, w)
    scale = size / resize_ratio / short
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    y0 = (nh - size) // 2
    x0 = (nw - size) // 2
    return img[y0 : y0 + size, x0 : x0 + size]


class ImageFolderLoader:
    """Sharded, seeded, pipelined loader over an ``ImageFolderDataset``.

    Yields ``{"image": uint8 [B,S,S,3], "label": int32 [B], "index": int32
    [B]}`` with STATIC shapes (drop-last). ``shard=(process_index,
    process_count)`` selects ``order[index::count]`` of each epoch's global
    permutation — deterministic, disjoint, and identical across hosts given
    the same seed (the reference's FFCV world_size sharding /
    DistributedSampler, ref randomlabel.py:72-77, CIFAR100.py:22-39).
    """

    def __init__(
        self,
        dataset: ImageFolderDataset,
        batch_size: int,
        image_size: int = 224,
        train: bool = True,
        shuffle: bool | None = None,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
        num_workers: int = 8,
        prefetch_batches: int = 4,
        indices: np.ndarray | None = None,
        use_native: bool | None = None,
        drop_last: bool | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_size = image_size
        self.train = train
        self.shuffle = train if shuffle is None else shuffle
        self.seed = seed
        self.shard = shard
        self.num_workers = num_workers
        self.prefetch_batches = prefetch_batches
        self.epoch = 0
        # train keeps static shapes (drop-last); eval keeps every sample —
        # the tail yields one smaller batch, matching DataLoader semantics
        self.drop_last = train if drop_last is None else drop_last
        self.indices = (
            np.arange(len(dataset)) if indices is None else np.asarray(indices)
        )
        # native C++ decode pool (DCT-scaled libjpeg, see native/ingest.cc) —
        # auto-enabled when the library builds; per-image fallback to the
        # OpenCV path for non-JPEG/corrupt files
        self._native = None
        if use_native is not False:
            from .native import NativeDecodePool, native_available

            if native_available():
                self._native = NativeDecodePool(num_workers)
            elif use_native:
                raise RuntimeError("use_native=True but the native ingest "
                                   "library failed to build")

    @property
    def num_samples(self):
        return len(self.indices)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        order = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100003 + self.epoch)
            order = rng.permutation(order)
        rank, world = self.shard
        shard_order = order[rank::world]
        if self.drop_last:
            # equalize shard lengths so every process runs the same step count
            shard_order = shard_order[: len(self.indices) // world]
        elif world > 1:
            # eval keeps every sample, but shards must still yield identical
            # batch counts AND tail-batch shapes, or the multi-host global
            # batch assembly deadlocks (round-2 advisor finding) — pad the
            # shorter shards by repeating their own head samples, the
            # DistributedSampler convention
            target = -(-len(order) // world)
            if len(shard_order) == 0:
                shard_order = order[:target]
            elif len(shard_order) < target:
                reps = np.tile(shard_order, -(-target // len(shard_order)))
                shard_order = reps[:target]
        return shard_order

    def __len__(self):
        rank, world = self.shard
        if self.drop_last:
            return (len(self.indices) // world) // self.batch_size
        # padded shards (see _epoch_order): every process sees ceil(N/world)
        n = -(-len(self.indices) // world)
        return -(-n // self.batch_size)

    def _load_one(self, idx: int) -> np.ndarray:
        img = _decode(self.dataset.paths[idx])
        if self.train:
            rng = np.random.default_rng(
                _epoch_key_base(self.seed, self.epoch) ^ int(idx)
            )
            return _random_resized_crop(img, self.image_size, rng)
        return _center_crop(img, self.image_size)

    def _load_batch(self, sel: np.ndarray) -> np.ndarray:
        """Decode one batch — native C++ pool when available (whole batch in
        one call, crops written into a single NHWC buffer), OpenCV threads
        otherwise; native per-image failures fall back to the OpenCV path."""
        if self._native is not None:
            paths = [self.dataset.paths[int(i)] for i in sel]
            base = _epoch_key_base(self.seed, self.epoch)
            keys = np.uint64(base) ^ sel.astype(np.uint64)
            imgs, status = self._native.decode_batch(
                paths, self.image_size, self.train, keys
            )
            for j in np.nonzero(status)[0]:
                imgs[j] = self._load_one(int(sel[j]))
            return imgs
        with ThreadPoolExecutor(self.num_workers) as pool:
            return np.stack(list(pool.map(self._load_one, sel)))

    def __iter__(self) -> Iterator[dict]:
        order = self._epoch_order()
        nb = len(self)
        if nb == 0:
            return
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        error: list[BaseException] = []

        def produce_with(load_batch):
            for i in range(nb):
                if stop.is_set():
                    break
                sel = order[i * self.batch_size : (i + 1) * self.batch_size]
                batch = {
                    "image": load_batch(sel),
                    "label": self.dataset.labels[sel],
                    "index": sel.astype(np.int32),
                }
                while not stop.is_set():
                    try:
                        out_q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        def producer():
            try:
                if self._native is not None:
                    produce_with(self._load_batch)
                else:
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        produce_with(
                            lambda sel: np.stack(
                                list(pool.map(self._load_one, sel))
                            )
                        )
            except BaseException as e:  # propagate decode errors to consumer
                error.append(e)
            finally:
                # drain-or-stop sentinel: an unconditional blocking put could
                # hang this thread forever if the consumer already left with
                # the queue full (round-2 advisor finding) — stop is set in
                # the consumer's finally, so this loop always terminates
                while not stop.is_set():
                    try:
                        out_q.put(None, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
            if error:
                raise error[0]
        finally:
            stop.set()
            try:
                thread.join(timeout=5)
            except Exception:
                # interpreter teardown: a GC'd generator may land here after
                # threading internals are gone; the producer is a daemon
                pass


# ---------------------------------------------------------------- packed --


def pack_image_folder(
    root: str | Path,
    out_dir: str | Path,
    image_size: int = 224,
    num_workers: int = 8,
    classes: list[str] | None = None,
) -> Path:
    """One-time decode+resize of an image folder into a raw uint8 memmap
    (`images.u8`, [N,S,S,3]) + `labels.npy` + `meta.json`. The read path is
    then pure memcpy — FFCV's .beton role for decode-bound hosts."""
    ds = ImageFolderDataset(root, classes=classes)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = len(ds)
    mm = np.lib.format.open_memmap(
        str(out / "images.npy"), mode="w+", dtype=np.uint8,
        shape=(n, image_size, image_size, 3),
    )

    def work(i):
        mm[i] = _center_crop(_decode(ds.paths[i]), image_size)

    with ThreadPoolExecutor(num_workers) as pool:
        list(pool.map(work, range(n)))
    mm.flush()
    np.save(out / "labels.npy", ds.labels)
    (out / "meta.json").write_text(
        json.dumps({"classes": ds.classes, "image_size": image_size, "n": n})
    )
    return out


class PackedDataset:
    """Memmap-backed packed dataset (ArrayDataset-compatible surface)."""

    def __init__(self, path: str | Path):
        path = Path(path)
        self.images = np.load(path / "images.npy", mmap_mode="r")
        self.labels = np.load(path / "labels.npy")
        meta = json.loads((path / "meta.json").read_text())
        self.classes = meta["classes"]

    def __len__(self):
        return len(self.images)


def load_packed(path: str | Path) -> PackedDataset:
    return PackedDataset(path)
