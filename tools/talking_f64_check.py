"""On-chip f64-referenced spot check for the talking-heads parameter grads
(VERDICT-r4 #6).

The dpre/dpost gates in tools/tpu_kernel_check.py sit at 1.5e-2/1e-2 —
~5× a measured 3e-3 f32 accumulation floor (the H×H grads reduce over
B·N² ≈ 1.5e5 terms). That floor was established on CPU; this script closes
the residual doubt by comparing the KERNEL's dpre/dpost as computed on the
chip against an f64 oracle on the SAME inputs.

Protocol (tunnel-friendly — only two [H,H] matrices cross the wire):

1. This process (default backend = the chip) runs the fused kernel's vjp at
   CaiT geometry and fetches dpre/dpost (16×16 f32 each — tiny).
2. A subprocess with JAX_ENABLE_X64=1 on CPU regenerates the identical
   inputs (same PRNG keys — threefry is backend-deterministic), computes
   the unfused einsum→sinkhorn→einsum reference in float64, and prints its
   dpre/dpost.
3. Compare: PASS iff max|Δ| ≤ 5e-3 (the f32 floor with margin; a lowering
   bug would read O(1)).

Usage: python tools/talking_f64_check.py [--interpret]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# same geometry as tools/tpu_kernel_check.py's talking-heads gate (the
# floor rationale's reference point; ref cait.py:66-119)
B, H, N = 4, 4, 196
ITERS, FINAL_ROW = 3, True
TOL = 5e-3

_ORACLE = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

B, H, N, ITERS, FINAL_ROW = %d, %d, %d, %d, %s

keys = jax.random.split(jax.random.PRNGKey(5), 4)
dots = jax.random.normal(keys[0], (B, H, N, N), jnp.float32)
pre = jax.random.normal(keys[1], (H, H), jnp.float32)
post = jax.random.normal(keys[2], (H, H), jnp.float32)
tang = jax.random.normal(keys[3], (B, H, N, N), jnp.float32)


def reference(dots, pre, post):
    dots64 = jnp.einsum("bhij,hg->bgij", dots.astype(jnp.float64),
                        pre.astype(jnp.float64))
    attn = jax.nn.softmax(dots64, axis=-1)
    for i in range(ITERS):
        if i > 0:
            attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        attn = attn / jnp.sum(attn, axis=-2, keepdims=True)
    if FINAL_ROW:
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    return jnp.einsum("bhij,hg->bgij", attn, post.astype(jnp.float64))


def loss(pre, post):
    return jnp.sum(reference(dots, pre, post) * tang.astype(jnp.float64))


dpre, dpost = jax.grad(loss, argnums=(0, 1))(pre, post)
print(json.dumps({"dpre": dpre.tolist(), "dpost": dpost.tolist()}))
"""


def main():
    interpret = "--interpret" in sys.argv

    import numpy as np

    import jax

    if interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from noise_robust_vit_tpu.ops.pallas.talking_heads import (
        talking_heads_sinkhorn,
        talking_heads_supported,
    )

    assert talking_heads_supported((B, H, N, N), ITERS)
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    dots = jax.random.normal(keys[0], (B, H, N, N), jnp.float32)
    pre = jax.random.normal(keys[1], (H, H), jnp.float32)
    post = jax.random.normal(keys[2], (H, H), jnp.float32)
    tang = jax.random.normal(keys[3], (B, H, N, N), jnp.float32)

    @jax.jit
    def kernel_grads(dots, pre, post, tang):
        def loss(pre, post):
            return jnp.sum(
                talking_heads_sinkhorn(dots, pre, post, ITERS, FINAL_ROW,
                                       interpret) * tang
            )

        return jax.grad(loss, argnums=(0, 1))(pre, post)

    dpre_k, dpost_k = jax.device_get(kernel_grads(dots, pre, post, tang))
    print(f"kernel grads fetched from backend={jax.default_backend()}",
          flush=True)

    # f64 oracle in a clean CPU process (x64 must be set before tracing;
    # PALLAS_AXON_POOL_IPS unset so a dead tunnel can't hang the import)
    env = dict(**__import__("os").environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    script = _ORACLE % (B, H, N, ITERS, FINAL_ROW)
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=900)
    if out.returncode != 0:
        print(out.stderr[-2000:])
        sys.exit(1)
    ref = json.loads(out.stdout.strip().splitlines()[-1])
    dpre_r = np.array(ref["dpre"])
    dpost_r = np.array(ref["dpost"])

    e_pre = float(np.max(np.abs(dpre_k - dpre_r)))
    e_post = float(np.max(np.abs(dpost_k - dpost_r)))
    scale_pre = float(np.max(np.abs(dpre_r)))
    scale_post = float(np.max(np.abs(dpost_r)))
    ok = e_pre <= TOL and e_post <= TOL
    print(json.dumps({
        "geometry": [B, H, N, N], "schedule": [ITERS, FINAL_ROW],
        "dpre_max_abs_err_vs_f64": round(e_pre, 6),
        "dpost_max_abs_err_vs_f64": round(e_post, 6),
        "dpre_scale": round(scale_pre, 3), "dpost_scale": round(scale_post, 3),
        "tol": TOL, "pass": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
