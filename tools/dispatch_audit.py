"""Robust-dispatch audit (VERDICT-r4 #5): which fused kernel serves each
zoo arch's robust attention, and which sites silently fall back to the XLA
vector-form Sinkhorn.

CPU-only and trace-time: every kernel dispatch in this framework is a
python-level decision on static shapes (ops/attention.py::*_dispatch,
ops/sinkhorn.py::sinkhorn_attention), so `jax.eval_shape` over the robust
train-mode forward exercises the exact branch each TPU run would take —
without executing a single kernel or touching the chip. The six pallas
entry points plus the XLA fallback (`sinkhorn_normalize`) are wrapped to
record (kernel, shape) per call site.

Usage: python tools/dispatch_audit.py [arch ...]   # default: the zoo table
Appends nothing; prints one JSON line per arch (consumed by zoo_sweep
--table's "robust path" column and RESULTS.md).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # env vars alone are NOT enough here

import jax.numpy as jnp

from noise_robust_vit_tpu import ops
from noise_robust_vit_tpu.models.factory import create_model

# (arch, batch, image) — mirror tools/zoo_sweep.py's cells (batch matters:
# streaming/biased group pickers read it; use the sweep's real batch)
ZOO = [
    ("pit_small", 128, 224), ("cross_vit_small", 128, 240),
    ("crossformer_small", 128, 224), ("scalable_vit_small", 128, 256),
    ("sep_vit_small", 128, 224), ("regionvit_small", 128, 224),
    ("mobile_vit_xs", 128, 256), ("cct_7", 256, 32), ("t2t_vit", 128, 224),
    ("ats_vit", 128, 224), ("local_vit", 128, 224),
    ("small_dataset_vit", 256, 64), ("simple_vit_b16", 256, 224),
    ("vit_b_16", 256, 224), ("swin_t", 128, 224), ("LeViT_128S", 256, 224),
    ("cait", 128, 224), ("deepvit", 128, 224), ("nest_tiny", 128, 224),
    ("rvt_small", 128, 224), ("cvt_13", 128, 224),
    ("twins_svt_small", 128, 224), ("maxvit_t", 128, 224),
]

CALLS: list[tuple[str, tuple]] = []


def _wrap(mod, name, tag, shape_arg=0):
    orig = getattr(mod, name)

    def rec(*a, **k):
        CALLS.append((tag, tuple(a[shape_arg].shape)))
        return orig(*a, **k)

    setattr(mod, name, rec)


def install():
    import noise_robust_vit_tpu.ops.attention as m_att
    import noise_robust_vit_tpu.ops.pallas.block_attention as m_blk
    import noise_robust_vit_tpu.ops.pallas.biased_attention as m_bia
    import noise_robust_vit_tpu.ops.pallas.sinkhorn_attention as m_sa
    import noise_robust_vit_tpu.ops.pallas.streaming_sinkhorn as m_str
    import noise_robust_vit_tpu.ops.pallas.sinkhorn_softmax as m_sm
    import noise_robust_vit_tpu.ops.pallas.talking_heads as m_th
    import noise_robust_vit_tpu.ops.sinkhorn as m_sk

    _wrap(m_blk, "packed_attention", "packed")
    _wrap(m_bia, "biased_attention", "biased")
    _wrap(m_sa, "fused_attention", "qkv-kernel")
    _wrap(m_str, "streaming_attention", "streaming")
    _wrap(m_sm, "sinkhorn_softmax", "logits-kernel")
    _wrap(m_sm, "sinkhorn_softmax_rect", "rect-kernel")
    _wrap(m_th, "talking_heads_sinkhorn", "talking-heads")
    # the XLA vector form — reached only when every kernel above refused.
    # ops/attention.py holds a BY-VALUE copy (`from .sinkhorn import
    # sinkhorn_normalize`), so wrap it there too or the whole XLA
    # attention_weights path records nothing (the round-5 audit's original
    # blind spot: cross_vit/mobile_vit/cct showed empty robust_paths).
    _wrap(m_sk, "sinkhorn_normalize", "XLA-FALLBACK")
    _wrap(m_att, "sinkhorn_normalize", "XLA-FALLBACK")


def audit(arch: str, batch: int, image: int) -> dict:
    CALLS.clear()
    model = create_model(arch, num_classes=1000, image_size=image,
                         robust=True, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, image, image, 3), jnp.bfloat16)
    variables = jax.eval_shape(model.init, rng, x[:2])
    CALLS.clear()  # init traced apply at batch 2 — keep only the real batch

    def fwd(v, x):
        out = model.apply(v, x, deterministic=False,
                          rngs={"dropout": rng, "ats": rng},
                          **({"mutable": ["batch_stats"]}
                             if "batch_stats" in variables else {}))
        return out

    jax.eval_shape(fwd, variables, x)
    sites: dict[str, list] = {}
    for tag, shape in CALLS:
        sites.setdefault(tag, [])
        if list(shape) not in sites[tag]:
            sites[tag].append(list(shape))
    return {"arch": arch, "batch": batch, "image": image, "robust_paths":
            {t: {"calls": sum(1 for c in CALLS if c[0] == t),
                 "shapes": s} for t, s in sites.items()}}


def main():
    ops.set_use_pallas(True)  # emulate the TPU dispatch decisions on CPU
    install()
    only = set(a for a in sys.argv[1:] if a != "--save")
    save = "--save" in sys.argv[1:]
    out = Path(__file__).resolve().parent / "dispatch_audit.jsonl"
    recs = []
    for arch, bs, img in ZOO:
        if only and arch not in only:
            continue
        try:
            rec = audit(arch, bs, img)
        except Exception as e:  # noqa: BLE001 — audit must cover the zoo
            rec = {"arch": arch, "error": repr(e)[:200]}
        recs.append(rec)
        print(json.dumps(rec), flush=True)
    if save:
        out.write_text("\n".join(json.dumps(r) for r in recs) + "\n")


if __name__ == "__main__":
    main()
