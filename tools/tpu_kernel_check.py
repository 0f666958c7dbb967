"""Real-TPU kernel regression gate (round-3 verdict #5).

Runs ALL THREE shipping Pallas kernels — packed-qkv attention
(ops/pallas/block_attention.py), biased windowed attention
(ops/pallas/biased_attention.py), and the logits-interface Sinkhorn
(ops/pallas/sinkhorn_softmax.py) — forward AND backward ON THE CHIP against
the XLA vector-form reference at the two shipping Sinkhorn schedules:
(3, True) — the SinkhornAttention op (ref utils.py:1031-1037) — and
(4, False) — the vendored-MHA path of vit_b_16(robust=True)
(ref utils.py:218-224).

Rationale: the test suite runs the kernels in interpret mode on CPU, which
cannot catch Mosaic lowering bugs — the fused-LN backward had a
real-TPU-only block-shape bug (commit 054c74a) invisible to interpret mode.
This script is the pre-bench gate: run it on the chip after touching any
kernel, BEFORE trusting bench numbers (CLAUDE.md conventions).

Axon-tunnel discipline: comparisons are computed ON DEVICE and only scalar
max-errors are fetched (large device->host transfers over the tunnel take
minutes; CLAUDE.md env quirks).

Usage:
    python tools/tpu_kernel_check.py            # on the chip
    python tools/tpu_kernel_check.py --interpret  # CPU interpret-mode dry run
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

# the two schedules the reference ships (SURVEY.md §7.3 faithful-vs-fixed)
SCHEDULES = [(3, True), (4, False)]

# fwd/bwd tolerances: the hand-derived backward matches the matrix-form
# reference to ~7e-7 at highest matmul precision (RESULTS.md parity section);
# 2e-5/5e-5 rtol leaves headroom for schedule-length accumulation
FWD_ATOL, FWD_RTOL = 5e-6, 2e-5
BWD_ATOL, BWD_RTOL = 2e-5, 5e-5

_FAILURES: list[str] = []


def _check(name: str, got, want, atol: float, rtol: float):
    """Device-side max-error check; fetches two scalars only."""
    got = got.astype(jnp.float32)
    want = want.astype(jnp.float32)
    abs_err = jnp.max(jnp.abs(got - want))
    # relative error where the reference is meaningfully nonzero
    rel_err = jnp.max(jnp.abs(got - want) / (jnp.abs(want) + atol / rtol))
    a = float(jax.device_get(abs_err))
    r = float(jax.device_get(rel_err))
    ok = a <= atol or r <= rtol
    status = "PASS" if ok else "FAIL"
    print(f"  [{status}] {name}: max_abs={a:.3e} max_rel={r:.3e} "
          f"(atol={atol:.0e} rtol={rtol:.0e})")
    if not ok:
        _FAILURES.append(name)


def _grads(loss_fn, *args):
    return jax.jit(jax.grad(loss_fn, argnums=tuple(range(len(args)))))(*args)


def check_packed(interpret: bool):
    """Packed-qkv kernel at the ViT-B shipping geometry: H=12, D=64,
    N=196 (simple_vit, no CLS) and N=197 (vit_b_16, CLS token — exercises
    the in-VMEM pad), robust at both schedules + the vanilla path."""
    from noise_robust_vit_tpu.ops.pallas.block_attention import packed_attention

    def reference(qkv, heads, dim_head, robust, iters, final_row):
        from noise_robust_vit_tpu.ops import dot_product_attention

        b, n, _ = qkv.shape
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
        out = dot_product_attention(
            q, k, v, scale=dim_head**-0.5, robust=robust,
            sinkhorn_iters=iters, final_row_norm=final_row, use_pallas=False,
        )
        return out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)

    h, d = 12, 64
    for n in (196, 197):
        b = 8
        qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * h * d),
                                jnp.float32)
        tang = jax.random.normal(jax.random.PRNGKey(1), (b, n, h * d),
                                 jnp.float32)
        cases = [(False, 3, True)] + [(True, i, f) for i, f in SCHEDULES]
        for robust, iters, final_row in cases:
            tag = (f"packed N={n} robust={int(robust)} "
                   f"sched=({iters},{int(final_row)})")
            out = jax.jit(lambda x: packed_attention(
                x, h, d, d**-0.5, robust, iters, final_row, interpret))(qkv)
            ref = jax.jit(lambda x: reference(
                x, h, d, robust, iters, final_row))(qkv)
            _check(f"{tag} fwd", out, ref, FWD_ATOL, FWD_RTOL)

            def lk(x):
                return jnp.sum(packed_attention(
                    x, h, d, d**-0.5, robust, iters, final_row, interpret
                ) * tang)

            def lr(x):
                return jnp.sum(reference(x, h, d, robust, iters, final_row)
                               * tang)

            (gk,) = _grads(lk, qkv)
            (gr,) = _grads(lr, qkv)
            _check(f"{tag} bwd dqkv", gk, gr, BWD_ATOL, BWD_RTOL)


def check_biased(interpret: bool):
    """Biased windowed kernel at the Swin-T stage-1 shipping geometry
    (N=49, nW=16 window types with shift mask roles) and a LeViT-like
    DV != D case; robust at both schedules — fwd + dq/dk/dv/dbias."""
    from noise_robust_vit_tpu.ops.pallas.biased_attention import (
        biased_attention,
        biased_attention_supported,
    )

    def reference(q, k, v, bias, nw, robust, iters, final_row):
        from noise_robust_vit_tpu.ops import dot_product_attention

        bw = q.shape[0]
        full_bias = jnp.tile(bias, (bw // nw, 1, 1, 1))
        return dot_product_attention(
            q, k, v, scale=q.shape[-1] ** -0.5, bias=full_bias, robust=robust,
            sinkhorn_iters=iters, final_row_norm=final_row, use_pallas=False,
        )

    # (BW, H, N, D, DV, nW): swin_t stage-1-like; levit-like rectangular v
    shapes = [(32, 3, 49, 32, 32, 16), (8, 4, 16, 16, 32, 1)]
    for bw, h, n, d, dv, nw in shapes:
        assert biased_attention_supported(bw, h, n, d, dv, nw)
        keys = jax.random.split(jax.random.PRNGKey(2), 5)
        q = jax.random.normal(keys[0], (bw, h, n, d), jnp.float32)
        k = jax.random.normal(keys[1], (bw, h, n, d), jnp.float32)
        v = jax.random.normal(keys[2], (bw, h, n, dv), jnp.float32)
        bias = jax.random.normal(keys[3], (nw, h, n, n), jnp.float32)
        tang = jax.random.normal(keys[4], (bw, h, n, dv), jnp.float32)
        for iters, final_row in SCHEDULES:
            tag = (f"biased N={n} nW={nw} DV={dv} "
                   f"sched=({iters},{int(final_row)})")
            out = jax.jit(lambda *a: biased_attention(
                *a, d**-0.5, True, iters, final_row, nw, interpret))(
                q, k, v, bias)
            ref = jax.jit(lambda *a: reference(
                *a, nw, True, iters, final_row))(q, k, v, bias)
            _check(f"{tag} fwd", out, ref, FWD_ATOL, FWD_RTOL)

            def lk(q, k, v, bias):
                return jnp.sum(biased_attention(
                    q, k, v, bias, d**-0.5, True, iters, final_row, nw,
                    interpret) * tang)

            def lr(q, k, v, bias):
                return jnp.sum(reference(q, k, v, bias, nw, True, iters,
                                         final_row) * tang)

            gk = _grads(lk, q, k, v, bias)
            gr = _grads(lr, q, k, v, bias)
            for name, a, b in zip(("dq", "dk", "dv", "dbias"), gk, gr):
                _check(f"{tag} bwd {name}", a, b, BWD_ATOL, BWD_RTOL)


def check_sinkhorn_softmax(interpret: bool):
    """Logits-interface kernel at the matrix-transforming models' shipping
    geometry (CaiT/DeepViT-class [B, H, 196+1, 196+1] logits); both
    schedules, fwd + dlogits."""
    from noise_robust_vit_tpu.ops.sinkhorn import sinkhorn_normalize
    from noise_robust_vit_tpu.ops.pallas.sinkhorn_softmax import (
        sinkhorn_softmax,
        sinkhorn_softmax_supported,
    )

    def reference(logits, iters, final_row):
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = sinkhorn_normalize(attn, num_iters=iters,
                                 final_row_norm=final_row)
        return out.astype(logits.dtype)

    for shape in ((4, 6, 197, 197), (8, 4, 64, 64)):
        logits = jax.random.normal(jax.random.PRNGKey(3), shape,
                                   jnp.float32) * 3.0
        tang = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
        for iters, final_row in SCHEDULES:
            assert sinkhorn_softmax_supported(shape, iters)
            tag = (f"sinkhorn_softmax {shape} "
                   f"sched=({iters},{int(final_row)})")
            out = jax.jit(lambda s: sinkhorn_softmax(
                s, iters, final_row, interpret))(logits)
            ref = jax.jit(lambda s: reference(s, iters, final_row))(logits)
            _check(f"{tag} fwd", out, ref, FWD_ATOL, FWD_RTOL)

            def lk(s):
                return jnp.sum(sinkhorn_softmax(s, iters, final_row,
                                                interpret) * tang)

            def lr(s):
                return jnp.sum(reference(s, iters, final_row) * tang)

            (gk,) = _grads(lk, logits)
            (gr,) = _grads(lr, logits)
            _check(f"{tag} bwd dlogits", gk, gr, BWD_ATOL, BWD_RTOL)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode dry run (script validation "
                    "only — the point of this gate is the real chip)")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    if not args.interpret and backend != "tpu" and backend != "axon":
        print(f"WARNING: backend is {backend!r}, not a TPU — Mosaic lowering "
              "is NOT being exercised; pass --interpret if this is intended")
    print(f"backend={backend} interpret={args.interpret}")

    t0 = time.perf_counter()
    # the XLA reference must run at highest matmul precision or MXU
    # fast-precision noise dominates the comparison (RESULTS.md parity)
    with jax.default_matmul_precision("highest"):
        for fn in (check_packed, check_biased, check_sinkhorn_softmax):
            print(f"== {fn.__name__} ==")
            fn(args.interpret)
    dt = time.perf_counter() - t0
    if _FAILURES:
        print(f"\nFAILED ({len(_FAILURES)}): " + "; ".join(_FAILURES))
        sys.exit(1)
    print(f"\nALL KERNEL CHECKS PASS ({dt:.0f}s)")


if __name__ == "__main__":
    main()
