"""Shared deterministic train-step for the multi-process test: fixed data,
fixed init, one DP step of a tiny robust SimpleViT; the loss must be
bit-identical (up to reduction order) whether the batch arrives from one
process or as two per-process shards."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

GLOBAL_BATCH = 16


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
