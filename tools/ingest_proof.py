"""ImageNet-scale ingest proof (VERDICT r2 #5): demonstrate the data path at
the real operating point — ViT-B/16 bs256 bf16 — and record what binds.

The reference trains through FFCV (ref examples/randomlabel.py:72-78), i.e. a
PRE-PACKED record format, not per-epoch JPEG decode; our equivalent is
`pack_image_folder` → memmap (train/image_data.py). The raw-JPEG path exists
for first-epoch/packing use and is decode-bound per host core (measured
numbers recorded by `loader`).

Modes (one per process — axon compiles are slow back-to-back):

  gen DIR [n] [h] [w]      synthetic ImageNet-sized JPEG tree (20 classes,
                           structured content so JPEG sizes are realistic)
  loader DIR [bs] [size]   loader-only decode+RRC rate from the JPEG tree
                           (native C++ pool; per-core img/s)
  pack DIR OUT [size]      one-time pack to raw uint8 memmap (FFCV role)
  h2d [bs] [size] [steps]  host→device uint8 batch transfer rate (the
                           tunnel's ceiling, for honest accounting)
  e2e PACKED [bs] [epochs] ViT-B/16 bf16 train from the packed memmap with
                           device-side crop+flip, overlapped host fetch
  resident [bs] [steps]    device-resident upper bound (same train step)
  e2e-jpeg DIR [bs] [steps] train fed by the native JPEG loader (decode-
                           bound on this 1-core host; reports overlap
                           efficiency vs the loader-only rate)
"""

from __future__ import annotations

import functools
import json
import queue
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from noise_robust_vit_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # tunnel compiles are minutes; reruns are disk hits


def _train_step_fn(model, tx):
    import jax
    import jax.numpy as jnp
    import optax

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, xu8, y, key):
        # device-side random 224-crop + flip + normalize from the packed
        # uint8 256px records (FFCV's RandomResizedCrop stage, on-chip)
        x = xu8.astype(jnp.float32) / 255.0
        b, h, w, c = x.shape
        size = 224
        k1, k2 = jax.random.split(key)
        oy = jax.random.randint(k1, (b,), 0, h - size + 1)
        ox = jax.random.randint(jax.random.fold_in(k1, 1), (b,), 0, w - size + 1)
        x = jax.vmap(
            lambda img, y0, x0: jax.lax.dynamic_slice(
                img, (y0, x0, 0), (size, size, c)
            )
        )(x, oy, ox)
        flip = jax.random.bernoulli(k2, 0.5, (b, 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
        x = (x - 0.45) / 0.225
        x = x.astype(jnp.bfloat16)

        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def _make_model_state(batch):
    import jax
    import jax.numpy as jnp
    import optax

    from noise_robust_vit_tpu.models.factory import create_model

    model = create_model(
        "simple_vit_b16", num_classes=1000, image_size=224,
        robust=False, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 224, 224, 3), jnp.bfloat16))
    tx = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = tx.init(params)
    return model, tx, params, opt_state


def gen(args):
    import cv2

    root = Path(args[0])
    n = int(args[1]) if len(args) > 1 else 10000
    h = int(args[2]) if len(args) > 2 else 1050
    w = int(args[3]) if len(args) > 3 else 1400
    rng = np.random.default_rng(0)
    classes = 20
    for c in range(classes):
        (root / f"class_{c:03d}").mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    total_bytes = 0
    # structured content (smooth field + edges + texture) so JPEG
    # compresses like a photo, not like noise. The field is synthesized at
    # quarter resolution and upscaled (structure identical under JPEG), and
    # per-pixel texture comes from a bank of precomputed noise planes under
    # random rolls — both keep the generator encode-bound (the naive
    # per-pixel loop ran 3 img/s on this 1-core host at 50k scale).
    hq, wq = h // 4, w // 4
    yy, xx = np.mgrid[0:hq, 0:wq].astype(np.float32)
    yy /= hq
    xx /= wq
    noise_bank = rng.normal(0, 12, (8, h, w, 3)).astype(np.float32)
    skipped = 0
    for i in range(n):
        p = root / f"class_{i % classes:03d}" / f"img_{i:06d}.jpg"
        if p.exists():  # resume from a partial tree
            rng.uniform(1, 6, 2)
            rng.uniform(0, 6.28, 4)
            total_bytes += p.stat().st_size
            skipped += 1
            continue
        f1, f2 = rng.uniform(1, 6, 2)
        ph = rng.uniform(0, 6.28, 4)
        base = (
            np.sin(yy * f1 * 6.28 + ph[0]) * 0.5
            + np.cos(xx * f2 * 6.28 + ph[1]) * 0.5
        )
        img_q = np.stack([
            base * 0.5 + 0.5,
            np.roll(base, hq // 7, axis=0) * 0.5 + 0.5,
            np.roll(base, wq // 9, axis=1) * 0.5 + 0.5,
        ], axis=-1)
        img = cv2.resize(img_q, (w, h), interpolation=cv2.INTER_LINEAR)
        tex = np.roll(noise_bank[i % 8], (i * 131) % h, axis=0)
        img = (img * 200 + tex).clip(0, 255).astype(np.uint8)
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        total_bytes += p.stat().st_size
        if i % 500 == 499:
            print(f"{i + 1}/{n} ({total_bytes / 1e6:.0f} MB, "
                  f"{(i + 1) / (time.time() - t0):.1f} img/s)", flush=True)
    print(json.dumps({
        "mode": "gen", "n": n, "h": h, "w": w,
        "mb": round(total_bytes / 1e6, 1),
        "avg_kb": round(total_bytes / n / 1e3, 1),
    }))


def loader(args):
    from noise_robust_vit_tpu.train.image_data import (
        ImageFolderDataset, ImageFolderLoader,
    )

    root = args[0]
    bs = int(args[1]) if len(args) > 1 else 256
    size = int(args[2]) if len(args) > 2 else 224
    ds = ImageFolderDataset(root)
    ld = ImageFolderLoader(ds, batch_size=bs, image_size=size, train=True,
                           num_workers=1, prefetch_batches=2)
    it = iter(ld)
    next(it)  # warm
    t0 = time.time()
    nb = 0
    for batch in it:
        nb += 1
        if nb >= 30:
            break
    dt = time.time() - t0
    print(json.dumps({
        "mode": "loader", "native": ld._native is not None,
        "img_per_sec_per_core": round(nb * bs / dt, 1),
        "n_images": len(ds), "size": size,
    }))


def pack(args):
    from noise_robust_vit_tpu.train.image_data import pack_image_folder

    root, out = args[0], args[1]
    size = int(args[2]) if len(args) > 2 else 256
    t0 = time.time()
    pack_image_folder(root, out, image_size=size, num_workers=1)
    dt = time.time() - t0
    meta = json.loads((Path(out) / "meta.json").read_text())
    print(json.dumps({
        "mode": "pack", "n": meta["n"], "size": size,
        "seconds": round(dt, 1),
        "img_per_sec_per_core": round(meta["n"] / dt, 1),
    }))


def h2d(args):
    import jax
    import jax.numpy as jnp

    bs = int(args[0]) if len(args) > 0 else 256
    size = int(args[1]) if len(args) > 1 else 256
    steps = int(args[2]) if len(args) > 2 else 20
    batch = np.random.default_rng(0).integers(
        0, 255, (bs, size, size, 3), np.uint8
    )
    s = jnp.sum(jax.device_put(batch).astype(jnp.int32))
    int(jax.device_get(s))
    t0 = time.time()
    for _ in range(steps):
        x = jax.device_put(batch)
        s = jnp.sum(x[0, 0, 0].astype(jnp.int32))  # tiny sync readback
        int(jax.device_get(s))
    dt = (time.time() - t0) / steps
    mb = batch.nbytes / 1e6
    print(json.dumps({
        "mode": "h2d", "batch_mb": round(mb, 1),
        "ms_per_batch": round(dt * 1000, 1),
        "mb_per_sec": round(mb / dt, 1),
        "img_per_sec_ceiling": round(bs / dt, 1),
    }))


def e2e(args):
    import jax

    from noise_robust_vit_tpu.train.image_data import PackedDataset

    packed = PackedDataset(args[0])
    bs = int(args[1]) if len(args) > 1 else 256
    epochs = int(args[2]) if len(args) > 2 else 2
    n = (len(packed) // bs) * bs
    model, tx, params, opt_state = _make_model_state(bs)
    step = _train_step_fn(model, tx)

    q: queue.Queue = queue.Queue(maxsize=4)
    stop = threading.Event()

    def producer():
        rng = np.random.default_rng(0)
        for ep in range(epochs):
            order = rng.permutation(len(packed))[:n]
            for i in range(0, n, bs):
                sel = np.sort(order[i:i + bs])
                img = packed.images[sel]  # memmap gather → contiguous
                lab = packed.labels[sel].astype(np.int32)
                while not stop.is_set():
                    try:
                        q.put((img, lab), timeout=1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        q.put(None)

    th = threading.Thread(target=producer, daemon=True)
    th.start()

    # Transfer-prefetch stage: the tunnel's h2d is the pipe (measured
    # 32.9 MB/s = 167 img/s ceiling at bs256 @256px uint8, "h2d" mode);
    # device_put in its own thread keeps the transfer running WHILE the
    # main thread dispatches the train step, instead of serializing
    # ~1.5 s of transfer + dispatch per batch.
    q2: queue.Queue = queue.Queue(maxsize=2)

    def transfer():
        while True:
            item = q.get()
            if item is None:
                q2.put(None)
                return
            img, lab = item
            q2.put((jax.device_put(img), jax.device_put(lab)))

    threading.Thread(target=transfer, daemon=True).start()
    rng = jax.random.PRNGKey(0)
    # warm/compile on the first batch
    img, lab = q2.get()
    params, opt_state, loss = step(params, opt_state, img, lab, rng)
    float(jax.device_get(loss))
    t0 = time.time()
    nb = 0
    while True:
        item = q2.get()
        if item is None:
            break
        img, lab = item
        rng = jax.random.fold_in(rng, nb)
        params, opt_state, loss = step(params, opt_state, img, lab, rng)
        nb += 1
    final = float(jax.device_get(loss))
    dt = time.time() - t0
    stop.set()
    print(json.dumps({
        "mode": "e2e_packed", "epochs": epochs, "batches": nb,
        "img_per_sec": round(nb * bs / dt, 1), "loss": round(final, 3),
    }))


def resident(args):
    import jax
    import jax.numpy as jnp

    bs = int(args[0]) if len(args) > 0 else 256
    steps = int(args[1]) if len(args) > 1 else 40
    model, tx, params, opt_state = _make_model_state(bs)
    step = _train_step_fn(model, tx)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 255, (bs, 256, 256, 3), np.uint8))
    lab = jax.device_put(rng.integers(0, 1000, (bs,)).astype(np.int32))
    key = jax.random.PRNGKey(0)
    params, opt_state, loss = step(params, opt_state, img, lab, key)
    float(jax.device_get(loss))
    t0 = time.time()
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = step(params, opt_state, img, lab, key)
    final = float(jax.device_get(loss))
    dt = time.time() - t0
    print(json.dumps({
        "mode": "resident", "img_per_sec": round(steps * bs / dt, 1),
        "loss": round(final, 3),
    }))


def e2e_jpeg(args):
    import jax

    from noise_robust_vit_tpu.train.image_data import (
        ImageFolderDataset, ImageFolderLoader,
    )

    root = args[0]
    bs = int(args[1]) if len(args) > 1 else 256
    max_steps = int(args[2]) if len(args) > 2 else 40
    ds = ImageFolderDataset(root)
    ld = ImageFolderLoader(ds, batch_size=bs, image_size=224, train=True,
                           num_workers=1, prefetch_batches=2)
    model, tx, params, opt_state = _make_model_state(bs)
    step = _train_step_fn(model, tx)
    key = jax.random.PRNGKey(0)
    it = iter(ld)
    b0 = next(it)
    # loader yields 224px crops already; pad to 256 records is unnecessary —
    # feed them directly (the device crop becomes identity at h==224)
    params, opt_state, loss = step(params, opt_state, b0["image"], b0["label"], key)
    float(jax.device_get(loss))
    t0 = time.time()
    nb = 0
    for batch in it:
        key = jax.random.fold_in(key, nb)
        params, opt_state, loss = step(
            params, opt_state, batch["image"], batch["label"], key
        )
        nb += 1
        if nb >= max_steps:
            break
    final = float(jax.device_get(loss))
    dt = time.time() - t0
    print(json.dumps({
        "mode": "e2e_jpeg", "batches": nb,
        "img_per_sec": round(nb * bs / dt, 1), "loss": round(final, 3),
    }))


def main():
    mode = sys.argv[1]
    args = sys.argv[2:]
    {"gen": gen, "loader": loader, "pack": pack, "h2d": h2d, "e2e": e2e,
     "resident": resident, "e2e-jpeg": e2e_jpeg}[mode](args)


if __name__ == "__main__":
    main()
