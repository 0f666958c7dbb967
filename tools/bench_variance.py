"""Robust-bench variance characterization (VERDICT r4 weak #1 / ask #2a).

Across four official round captures, vanilla ViT-B/16 held ±0.4% while the
robust number swung 899.8–949.9 img/s (±4 MFU points). This tool measures
BOTH paths' window-to-window distribution in ONE process, interleaved
(v r v r …), so host-side effects hit both alike and a robust-specific
mechanism separates from global noise:

  python tools/bench_variance.py [windows=10] [steps=20]

Prints one JSON line per window plus a summary with min/median/max and the
coefficient of variation per mode — the paste-ready RESULTS.md table input.
Interleaving matters: back-to-back same-mode windows confound drift with
mode; alternation samples both modes under the same drift.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench.py: model/step construction)

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from noise_robust_vit_tpu.models.factory import create_model  # noqa: E402


def _build(robust: bool, batch: int):
    model = create_model(
        "simple_vit_b16", num_classes=1000, image_size=224,
        robust=robust, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 224, 224, 3), jnp.bfloat16)
    y = jax.random.randint(rng, (batch,), 0, 1000)
    params = model.init(rng, x[:2])
    tx = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = tx.init(params)

    # NO donation: both modes' states stay live in the same process, and a
    # donated buffer would invalidate the other mode's carry. The ~8 ms/step
    # donation saving shifts both modes identically, so ratios/variance hold.
    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return {"step": train_step, "params": params, "opt": opt_state,
            "x": x, "y": y}


def _window(s, steps: int, batch: int) -> float:
    t0 = time.perf_counter()
    for _ in range(steps):
        s["params"], s["opt"], loss = s["step"](s["params"], s["opt"],
                                                s["x"], s["y"])
    float(jax.device_get(loss))  # tunnel-safe sync (CLAUDE.md)
    return batch * steps / (time.perf_counter() - t0)


def main():
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    batch = 256
    states = {"vanilla": _build(False, batch), "robust": _build(True, batch)}
    # compile + one throwaway warm window each
    for mode, s in states.items():
        _window(s, 2, batch)

    rates: dict[str, list[float]] = {"vanilla": [], "robust": []}
    for w in range(windows):
        for mode in ("vanilla", "robust"):
            r = _window(states[mode], steps, batch)
            rates[mode].append(r)
            print(json.dumps({"window": w, "mode": mode,
                              "img_per_sec": round(r, 1)}), flush=True)

    flops = bench.vit_train_flops_per_image()
    summary = {}
    for mode, rs in rates.items():
        mfus = [r * flops / bench.PEAK_FLOPS_V5E for r in rs]
        summary[mode] = {
            "n": len(rs),
            "min": round(min(rs), 1),
            "median": round(statistics.median(rs), 1),
            "max": round(max(rs), 1),
            "cv_pct": round(100 * statistics.stdev(rs) / statistics.mean(rs),
                            2) if len(rs) > 1 else 0.0,
            "mfu_min": round(min(mfus), 4),
            "mfu_median": round(statistics.median(mfus), 4),
        }
    print(json.dumps({"summary": summary, "steps": steps, "batch": batch}))


if __name__ == "__main__":
    main()
