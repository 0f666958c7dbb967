"""Step-anatomy ablation probe for the ViT-B/16 train step (one mode per
process — back-to-back large compiles over the axon tunnel are slow).

Usage: python tools/perf_probe.py MODE [BATCH] [STEPS]

Timing follows bench.py: carried-params python loop + final scalar
device_get (block_until_ready returns early on axon — CLAUDE.md).
Appends one JSON line per run to /tmp/probe_results.jsonl.
"""

from __future__ import annotations

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


def fused_adamw(lr=1e-3, b1=0.9, b2=0.999, eps=1e-8, wd=0.05):
    """Single-tree_map AdamW: one fused elementwise pass over (p, m, v, g)."""

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"mu": zeros, "nu": jax.tree_util.tree_map(jnp.zeros_like, params), "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        t = state["t"] + 1
        c1 = 1.0 - b1 ** t.astype(jnp.float32)
        c2 = 1.0 - b2 ** t.astype(jnp.float32)

        def upd(g, m, v, p):
            g = g.astype(jnp.float32)
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            step = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps) + wd * p
            return -lr * step, m2, v2

        out = jax.tree_util.tree_map(upd, grads, state["mu"], state["nu"], params)
        updates = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"mu": mu, "nu": nu, "t": t}

    return optax.GradientTransformation(init, update)


def main():
    mode = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    if mode == "noattn":
        def fake_attn(q, k, v, **kw):
            return v
        ops.dot_product_attention = fake_attn
        # the packed fused path bypasses dot_product_attention — disable its
        # dispatch so the ablation actually removes attention
        ops.packed_dispatch = lambda *a, **kw: False
        import noise_robust_vit_tpu.models.layers as _l
        _l.ops.dot_product_attention = fake_attn
        _l.ops.packed_dispatch = lambda *a, **kw: False
    elif mode == "noln":
        # LayerNorm → affine-only module: bounds the best case of any
        # fused-LN kernel, since no kernel beats deleting the moment
        # computation + normalization entirely (VERDICT r2 #9 ceiling probe).
        # Swapping the class (models look up nn.LayerNorm at trace time)
        # keeps flax's compact-method machinery intact.
        import flax.linen as fnn

        class AffineOnly(fnn.Module):
            epsilon: float = 1e-6
            dtype: object = None
            param_dtype: object = jnp.float32
            use_bias: bool = True
            use_scale: bool = True

            @fnn.compact
            def __call__(self, x):
                dtype = self.dtype or x.dtype
                f = x.shape[-1]
                y = x.astype(dtype)
                if self.use_scale:
                    s = self.param("scale", fnn.initializers.ones, (f,),
                                   self.param_dtype)
                    y = y * s.astype(dtype)
                if self.use_bias:
                    b = self.param("bias", fnn.initializers.zeros, (f,),
                                   self.param_dtype)
                    y = y + b.astype(dtype)
                return y

        fnn.LayerNorm = AffineOnly
    elif mode == "nosm":
        def nosm_attn(q, k, v, *, scale=None, **kw):
            s = scale or q.shape[-1] ** -0.5
            logits = jnp.einsum("...nd,...md->...nm", q, k,
                                preferred_element_type=jnp.float32) * s
            return jnp.einsum("...nm,...md->...nd", logits.astype(v.dtype), v,
                              preferred_element_type=jnp.float32).astype(v.dtype)
        ops.dot_product_attention = nosm_attn
        ops.packed_dispatch = lambda *a, **kw: False
        import noise_robust_vit_tpu.models.layers as _l
        _l.ops.dot_product_attention = nosm_attn
        _l.ops.packed_dispatch = lambda *a, **kw: False

    robust = mode == "robust"
    model = create_model(
        "simple_vit_b16", num_classes=1000, image_size=224,
        robust=robust, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.bfloat16)
    y = jax.random.randint(rng, (batch,), 0, 1000)
    params = model.init(rng, x[:2])

    if mode == "sgd":
        tx = optax.sgd(1e-3)
    elif mode == "fusedadam":
        tx = fused_adamw()
    else:
        tx = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = tx.init(params)

    donate = () if mode == "nodonate" else (0, 1)

    if mode == "fwd":
        @jax.jit
        def step_fwd(params, acc, x, y):
            logits = model.apply(params, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y).mean()
            return acc + loss

        acc = step_fwd(params, jnp.zeros(()), x, y)
        float(jax.device_get(acc))
        t0 = time.perf_counter()
        for _ in range(steps):
            acc = step_fwd(params, acc, x, y)
        float(jax.device_get(acc))
        dt = time.perf_counter() - t0
    else:
        def train_step_fn(params, opt_state, x, y):
            def loss_fn(p):
                logits = model.apply(p, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss

        train_step = jax.jit(train_step_fn, donate_argnums=donate)

        params, opt_state, loss = train_step(params, opt_state, x, y)
        float(jax.device_get(loss))
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, loss = train_step(params, opt_state, x, y)
        float(jax.device_get(loss))
        dt = time.perf_counter() - t0

    ms = dt / steps * 1000
    rec = {"mode": mode, "batch": batch, "steps": steps,
           "ms_per_step": round(ms, 2),
           "img_per_sec": round(batch * steps / dt, 1)}
    print(json.dumps(rec))
    with open("/tmp/probe_results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
