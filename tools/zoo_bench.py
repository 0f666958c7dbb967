"""Zoo throughput bench: one model per process (back-to-back large compiles
over the axon tunnel are slow — CLAUDE.md).

Times the full jitted train step (fwd + bwd + AdamW, donated) on synthetic
device-resident tensors and prints ONE JSON line.

Usage: python tools/zoo_bench.py ARCH [vanilla|robust] [batch] [image] [steps]
e.g.   python tools/zoo_bench.py swin_t robust 128 224 20
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from noise_robust_vit_tpu import ops
from noise_robust_vit_tpu.models.factory import create_model
from noise_robust_vit_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    import os

    if os.environ.get("NRV_NO_PALLAS"):
        ops.set_use_pallas(False)
    arch = sys.argv[1]
    robust = (sys.argv[2] if len(sys.argv) > 2 else "vanilla") == "robust"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    image = int(sys.argv[4]) if len(sys.argv) > 4 else 224
    steps = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    dtype = jnp.bfloat16

    model = create_model(
        arch, num_classes=1000, image_size=image, robust=robust, dtype=dtype
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, image, image, 3), dtype)
    y = jax.random.randint(rng, (batch,), 0, 1000)
    variables = model.init(rng, x[:2])
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = tx.init(params)

    has_bn = "batch_stats" in model_state

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, opt_state, model_state, x, y, key):
        # true train-mode cost: deterministic=False (dropout/drop-path live)
        # + BN stats update (mutable) when the arch has them — the exact
        # semantics examples/classification.py trains with
        rngs = {"dropout": key}

        def loss_fn(p):
            if has_bn:
                out, new_state = model.apply(
                    {"params": p, **model_state}, x,
                    deterministic=False, rngs=rngs,
                    mutable=["batch_stats"],
                )
            else:
                out, new_state = model.apply(
                    {"params": p, **model_state}, x,
                    deterministic=False, rngs=rngs,
                ), model_state
            logits = out[0] if isinstance(out, tuple) else out
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if has_bn:
            model_state = {**model_state, **new_state}
        return params, opt_state, model_state, loss

    step_key = jax.random.PRNGKey(1)
    params, opt_state, model_state, loss = train_step(
        params, opt_state, model_state, x, y, step_key
    )
    float(jax.device_get(loss))  # sync: block_until_ready lies on axon

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, model_state, loss = train_step(
            params, opt_state, model_state, x, y, step_key
        )
    final_loss = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "arch": arch,
                "robust": robust,
                "batch": batch,
                "image": image,
                "img_per_sec": round(batch * steps / dt, 1),
                "ms_per_step": round(dt / steps * 1000, 2),
                "loss": round(final_loss, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
