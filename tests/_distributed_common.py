"""Shared deterministic train-step for the multi-process test: fixed data,
fixed init, one DP step of a tiny robust SimpleViT; the loss must be
bit-identical (up to reduction order) whether the batch arrives from one
process or as two per-process shards."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

GLOBAL_BATCH = 16


def make_jpeg_tree(root, n: int = 48, size: int = 40, classes: int = 3):
    """Deterministic tiny ImageFolder JPEG tree shared by the 2-process
    loader-parity test (the reference trains from sharded FFCV readers over
    a real image tree, ref examples/randomlabel.py:72-78)."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(11)
    for c in range(classes):
        (root / f"class_{c}").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3), np.uint8)
        # smooth it so JPEG round-trips closer to the array (not load-bearing
        # for parity — both paths decode the same bytes)
        img = cv2.GaussianBlur(img, (5, 5), 0)
        cv2.imwrite(
            str(root / f"class_{i % classes}" / f"img_{i:04d}.jpg"),
            img, [cv2.IMWRITE_JPEG_QUALITY, 95],
        )
    return root


def run_one_step_jpeg(root, shard, batch_size, put_batch) -> float:
    """One DP step fed from a REAL JPEG tree through ImageFolderLoader with
    ``shard=(process_index, process_count)`` — the loss must match the
    single-process shard=(0,1) run because per-sample crop keys are keyed by
    dataset index (shard-layout invariant) and the first global batch covers
    the same sample set in any interleaving (mean loss is order-invariant)."""
    from noise_robust_vit_tpu.models import SimpleViT
    from noise_robust_vit_tpu.train.image_data import (
        ImageFolderDataset,
        ImageFolderLoader,
    )

    ds = ImageFolderDataset(root)
    loader = ImageFolderLoader(
        ds, batch_size=batch_size, image_size=16, train=True, seed=3,
        shard=shard, num_workers=2, prefetch_batches=2,
    )
    host = next(iter(loader))

    model = SimpleViT(
        image_size=16, patch_size=8, num_classes=8, dim=32, depth=2,
        heads=4, mlp_dim=64, robust=True,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x.astype(jnp.float32) / 255.0 - 0.5)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = put_batch({"image": host["image"], "label": host["label"]})
    params, opt_state, loss = step(
        params, opt_state, batch["image"], batch["label"]
    )
    params, opt_state, loss = step(
        params, opt_state, batch["image"], batch["label"]
    )
    return float(jax.device_get(loss))


def _data():
    rng = np.random.default_rng(7)
    return {
        "image": rng.standard_normal((GLOBAL_BATCH, 16, 16, 3)).astype(np.float32),
        "label": rng.integers(0, 8, GLOBAL_BATCH).astype(np.int32),
    }


def run_one_step(put_batch) -> float:
    """``put_batch(host_batch) -> device_batch`` places the global batch
    (single-process: device_put; multi-process: per-shard assembly)."""
    from noise_robust_vit_tpu.models import SimpleViT

    model = SimpleViT(
        image_size=16, patch_size=8, num_classes=8, dim=32, depth=2,
        heads=4, mlp_dim=64, robust=True,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = put_batch(_data())
    params, opt_state, loss = step(
        params, opt_state, batch["image"], batch["label"]
    )
    # second step so the gradient all-reduce's effect on params is covered
    params, opt_state, loss = step(
        params, opt_state, batch["image"], batch["label"]
    )
    return float(jax.device_get(loss))
