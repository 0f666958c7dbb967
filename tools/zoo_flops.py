"""Analytic-free FLOPs for the zoo table's MFU column.

Lowers the FORWARD pass on the CPU backend and reads XLA's cost analysis
(`utils/profiling.py::xla_flops`); the train step is estimated at 3x forward
(the standard fwd:bwd ratio for GEMM-dominated nets). MFU then =
3 * fwd_flops_per_img * img_per_sec / peak, peak = 197e12 (v5e bf16).

Usage: python tools/zoo_flops.py arch [image] [arch ...]
Prints one JSON line per arch: {"arch": ..., "gflops_fwd_per_img": N}.

Run AFTER chip measurements (CPU compiles here would skew concurrent
TPU timing on this 1-core host).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from noise_robust_vit_tpu.models.factory import create_model  # noqa: E402
from noise_robust_vit_tpu.utils.profiling import xla_flops  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    image = 224
    archs = []
    for a in args:
        if a.isdigit():
            image = int(a)
        else:
            archs.append(a)
    bs = 8
    for arch in archs:
        model = create_model(
            arch, num_classes=1000, image_size=image, robust=False,
            dtype=jnp.bfloat16,
        )
        x = jnp.zeros((bs, image, image, 3), jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), x)

        def fwd(v, xx):
            out = model.apply(v, xx)
            return out[0] if isinstance(out, tuple) else out

        flops = xla_flops(fwd, variables, x)
        # None (cost analysis unavailable) must stay visibly null — a silent
        # 0.0 would propagate a wrong 0% MFU into the zoo table.
        per_img = None if flops is None else round(flops / bs / 1e9, 2)
        print(json.dumps({
            "arch": arch, "image": image,
            "gflops_fwd_per_img": per_img,
        }), flush=True)


if __name__ == "__main__":
    main()
