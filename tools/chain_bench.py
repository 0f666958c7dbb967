"""In-jit kernel-chain microbenchmark (CLAUDE.md: only trust in-jit chains
on axon). Times 12 chained packed_attention calls (ViT-B/16 geometry,
B=256 H=12 N=196 D=64 bf16): fwd-only and fwd+bwd, plain and robust.

Usage: python tools/chain_bench.py [fwd|fb] [plain|robust] [batch] [steps]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from noise_robust_vit_tpu.ops.pallas.block_attention import packed_attention

DEPTH = 12
H, D = 12, 64
N = 196


def main():
    direction = sys.argv[1] if len(sys.argv) > 1 else "fb"
    robust = (sys.argv[2] if len(sys.argv) > 2 else "robust") == "robust"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    iters, final_row = (4, False)

    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (batch, N, 3 * H * D), jnp.bfloat16)

    def chain(qkv):
        out = qkv
        for _ in range(DEPTH):
            o = packed_attention(out, H, D, D**-0.5, robust, iters, final_row)
            # feed back so the chain is sequential (no overlap across layers)
            out = jnp.concatenate([o, o, o], axis=-1).astype(qkv.dtype)
        return jnp.sum(out.astype(jnp.float32))

    if direction == "fwd":
        fn = jax.jit(chain)
    else:
        fn = jax.jit(jax.grad(lambda q: chain(q)))

    r = fn(qkv)
    float(jax.device_get(jnp.sum(r.astype(jnp.float32)) if r.ndim else r))
    t0 = time.perf_counter()
    for _ in range(steps):
        r = fn(qkv)
    float(jax.device_get(jnp.sum(r.astype(jnp.float32)) if r.ndim else r))
    dt = (time.perf_counter() - t0) / steps * 1000
    print(json.dumps({
        "direction": direction, "robust": robust, "batch": batch,
        "ms_per_chain12": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
