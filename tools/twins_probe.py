"""Twins-SVT step-anatomy probe (VERDICT-r3 #2a: twins_svt_small vanilla ran
~278 img/s at bs128 — order 2% MFU — and nobody knew where the time went).

Ablates one component per process (axon compile discipline) by
monkeypatching `models/twins_svt.py` before model construction, then times
the same donated train step as tools/zoo_bench.py:

  full       unmodified model
  novmat     _mh_attention returns q: keeps all convs/rearranges/LN, skips
             dots einsum + softmax + attn@v (the N² math)
  nosm       softmax → identity: keeps both attention GEMMs
  nolocal    _LocalAttention → 1×1 conv (its window rearranges + attention go)
  noglobal   _GlobalAttention → 1×1 conv (the N=3136-query attention goes)
  nopeg      PEG depthwise conv → identity (grouped convs are a classic TPU
             slow path)

Usage: python tools/twins_probe.py MODE [vanilla|robust] [batch] [image]
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
from flax import linen as nn

from noise_robust_vit_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # each mode re-pays a >900s tunnel compile otherwise


def _apply_mode(mode: str):
    import noise_robust_vit_tpu.models.twins_svt as tw

    if mode == "full":
        return
    if mode == "novmat":
        tw._mh_attention = lambda q, k, v, heads, dim_head, robust: q
    elif mode == "nosm":
        tw.robust_softmax = lambda dots, robust=False, axis=-1: dots
    elif mode == "nolocal":
        def call(self, x, *, deterministic=True):
            return nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                           name="to_out")(x)

        tw._LocalAttention.__call__ = call
    elif mode == "noglobal":
        def call(self, x, *, deterministic=True):
            return nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                           name="to_out")(x)

        tw._GlobalAttention.__call__ = call
    elif mode == "nopeg":
        import flax.linen as fl

        real_conv = fl.Conv

        class _Conv(real_conv):
            def __call__(self, x):
                if self.feature_group_count > 1:
                    return x
                return super().__call__(x)

        tw.nn.Conv = _Conv
    else:
        raise SystemExit(f"unknown mode {mode}")


def main():
    mode = sys.argv[1]
    robust = (sys.argv[2] if len(sys.argv) > 2 else "vanilla") == "robust"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    image = int(sys.argv[4]) if len(sys.argv) > 4 else 224
    _apply_mode(mode)

    from noise_robust_vit_tpu.models.factory import create_model

    dtype = jnp.bfloat16
    model = create_model("twins_svt_small", num_classes=1000,
                         image_size=image, robust=robust, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, image, image, 3), dtype)
    y = jax.random.randint(rng, (batch,), 0, 1000)
    params = model.init(rng, x[:2])["params"]
    tx = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, opt_state, loss = train_step(params, opt_state, x, y)
    float(jax.device_get(loss))
    steps = 10
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = train_step(params, opt_state, x, y)
    final = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": mode, "robust": robust, "batch": batch,
        "ms_per_step": round(dt / steps * 1000, 2),
        "img_per_sec": round(batch * steps / dt, 1),
        "loss": round(final, 4),
    }))


if __name__ == "__main__":
    main()
