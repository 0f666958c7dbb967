"""Real-TPU kernel regression gate (round-3 verdict #5).

Runs ALL SIX shipping Pallas kernels — packed-qkv attention
(ops/pallas/block_attention.py), biased windowed attention
(ops/pallas/biased_attention.py), the logits-interface Sinkhorn
(ops/pallas/sinkhorn_softmax.py), the fused talking-heads sandwich
(ops/pallas/talking_heads.py), the rectangular logits kernel
(sinkhorn_softmax_rect), and the streaming q/k/v-interface giant-N kernel
(ops/pallas/streaming_sinkhorn.py) — forward AND backward ON THE CHIP against
the XLA vector-form reference at the two shipping Sinkhorn schedules:
(3, True) — the SinkhornAttention op (ref utils.py:1031-1037) — and
(4, False) — the vendored-MHA path of vit_b_16(robust=True)
(ref utils.py:218-224).

Rationale: the test suite runs the kernels in interpret mode on CPU, which
cannot catch Mosaic lowering bugs — the fused-LN backward had a
real-TPU-only block-shape bug (commit 054c74a) invisible to interpret mode.
This script is the pre-bench gate: run it on the chip after touching any
kernel, BEFORE trusting bench numbers (CLAUDE.md conventions).

Axon-tunnel discipline (CLAUDE.md): ONE jitted program per kernel computes
every fwd/bwd max-error ON DEVICE and returns a handful of scalars — no
per-case compiles (a first draft with ~56 separate jits starved on tunnel
compile latency), no bulk device->host transfers.

Usage:
    python tools/tpu_kernel_check.py              # on the chip
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

# fwd/bwd tolerances: interpret mode matches to ~7e-7, and on-chip FORWARD
# matches to ~5e-7 — but the on-chip BACKWARD floor is ~5.6e-5 even at
# jax.default_matmul_precision("highest") (measured round 4: XLA-highest vs
# Mosaic-highest accumulate differently across the chain's dot_generals;
# precision-context ablations ruled out a lowering bug — CPU interpret
# proves the math). Gate at ~5× the measured floor: real block-shape bugs
# (the fused-LN class, commit 054c74a) produce O(1) garbage, not 1e-4.
FWD_ATOL, FWD_RTOL = 5e-6, 2e-5
BWD_ATOL, BWD_RTOL = 3e-4, 3e-4
# H×H parameter grads (talking-heads dpre/dpost) reduce over B·N² ≈ 1.5e5
# terms; a round-4 f64 probe measured the f32 floor at ~3e-3 abs for the
# kernel and ~1.3e-3 for XLA's own einsum vjp at CaiT geometry — gate these
# at ~5× the kernel floor (block-shape bugs still read as O(1) garbage)
PARAM_ATOL, PARAM_RTOL = 1.5e-2, 1e-2

_FAILURES: list[str] = []


def _err(got, want, atol, rtol):
    """On-device (abs_err, rel_err) scalars."""
    got = got.astype(jnp.float32)
    want = want.astype(jnp.float32)
    d = jnp.abs(got - want)
    return jnp.max(d), jnp.max(d / (jnp.abs(want) + atol / rtol))


def _report(name: str, errs: dict):
    for case, (a, r) in errs.items():
        a, r = float(a), float(r)
        if case.endswith("fwd"):
            atol, rtol = FWD_ATOL, FWD_RTOL
        elif case.endswith(("dpre", "dpost")):
            atol, rtol = PARAM_ATOL, PARAM_RTOL
        else:
            atol, rtol = BWD_ATOL, BWD_RTOL
        ok = a <= atol or r <= rtol
        status = "PASS" if ok else "FAIL"
        print(f"  [{status}] {name} {case}: max_abs={a:.3e} max_rel={r:.3e}")
        if not ok:
            _FAILURES.append(f"{name} {case}")


def check_packed(interpret: bool):
    """Packed-qkv kernel at the ViT-B shipping geometry: H=12, D=64, N=197
    (vit_b_16's CLS token — exercises the in-VMEM pad); vanilla + robust at
    both shipping schedules, fwd + dqkv, one compiled program."""
    from noise_robust_vit_tpu.ops import dot_product_attention
    from noise_robust_vit_tpu.ops.pallas.block_attention import packed_attention

    # interpret mode (script validation) runs python-per-program: tiny shapes
    h, d, n, b = (2, 64, 25, 2) if interpret else (12, 64, 197, 8)

    def reference(qkv, robust, iters, final_row):
        bb, nn, _ = qkv.shape
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bb, nn, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(bb, nn, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(bb, nn, h, d).transpose(0, 2, 1, 3)
        out = dot_product_attention(
            q, k, v, scale=d**-0.5, robust=robust,
            sinkhorn_iters=iters, final_row_norm=final_row, use_pallas=False,
        )
        return out.transpose(0, 2, 1, 3).reshape(bb, nn, h * d)

    cases = [(False, 3, True)] + [(True, i, f) for i, f in SCHEDULES]

    @jax.jit
    def run(qkv, tang):
        errs = {}
        for robust, iters, final_row in cases:
            tag = f"robust={int(robust)} sched=({iters},{int(final_row)})"

            def kfn(x):
                return packed_attention(x, h, d, d**-0.5, robust, iters,
                                        final_row, interpret)

            def rfn(x):
                return reference(x, robust, iters, final_row)

            ok_, vjp_k = jax.vjp(kfn, qkv)
            or_, vjp_r = jax.vjp(rfn, qkv)
            errs[f"{tag} fwd"] = _err(ok_, or_, FWD_ATOL, FWD_RTOL)
            (gk,), (gr,) = vjp_k(tang), vjp_r(tang)
            errs[f"{tag} bwd dqkv"] = _err(gk, gr, BWD_ATOL, BWD_RTOL)
        return errs

    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * h * d),
                            jnp.float32)
    tang = jax.random.normal(jax.random.PRNGKey(1), (b, n, h * d),
                             jnp.float32)
    _report(f"packed N={n}", jax.device_get(run(qkv, tang)))


def check_biased(interpret: bool):
    """Biased windowed kernel at the Swin-T stage-1 shipping geometry
    (N=49, nW=16 window types, DV=D) with LeViT-like rectangular DV != D;
    robust at both schedules — fwd + dq/dk/dv/dbias, one compiled program."""
    from noise_robust_vit_tpu.ops import dot_product_attention
    from noise_robust_vit_tpu.ops.pallas.biased_attention import (
        biased_attention,
        biased_attention_supported,
    )

    bw, h, n, d, dv, nw = (
        (8, 2, 17, 16, 32, 4) if interpret else (32, 3, 49, 32, 64, 16)
    )
    assert biased_attention_supported(bw, h, n, d, dv, nw)

    def reference(q, k, v, bias, iters, final_row):
        full_bias = jnp.tile(bias, (bw // nw, 1, 1, 1))
        return dot_product_attention(
            q, k, v, scale=d**-0.5, bias=full_bias, robust=True,
            sinkhorn_iters=iters, final_row_norm=final_row, use_pallas=False,
        )

    @jax.jit
    def run(q, k, v, bias, tang):
        errs = {}
        for iters, final_row in SCHEDULES:
            tag = f"sched=({iters},{int(final_row)})"

            def kfn(q, k, v, bias):
                return biased_attention(q, k, v, bias, d**-0.5, True, iters,
                                        final_row, nw, interpret)

            def rfn(q, k, v, bias):
                return reference(q, k, v, bias, iters, final_row)

            ok_, vjp_k = jax.vjp(kfn, q, k, v, bias)
            or_, vjp_r = jax.vjp(rfn, q, k, v, bias)
            errs[f"{tag} fwd"] = _err(ok_, or_, FWD_ATOL, FWD_RTOL)
            for name, a, b in zip(("dq", "dk", "dv", "dbias"),
                                  vjp_k(tang), vjp_r(tang)):
                errs[f"{tag} bwd {name}"] = _err(a, b, BWD_ATOL, BWD_RTOL)
        return errs

    keys = jax.random.split(jax.random.PRNGKey(2), 5)
    q = jax.random.normal(keys[0], (bw, h, n, d), jnp.float32)
    k = jax.random.normal(keys[1], (bw, h, n, d), jnp.float32)
    v = jax.random.normal(keys[2], (bw, h, n, dv), jnp.float32)
    bias = jax.random.normal(keys[3], (nw, h, n, n), jnp.float32)
    tang = jax.random.normal(keys[4], (bw, h, n, dv), jnp.float32)
    _report(f"biased N={n} nW={nw} DV={dv}",
            jax.device_get(run(q, k, v, bias, tang)))


def check_nobias(interpret: bool):
    """The static no-bias fast path (Twins local attention,
    models/twins_svt.py:90-105 — ref twins_svt.py:89-120): the kernel elides
    the bias operand/add and the dbias accumulation entirely. Covers BOTH
    the robust schedules AND the plain-softmax mode (``robust=False``) that
    NRV_FUSED_PLAIN_LOCAL routes Twins *vanilla* through — the one biased-
    kernel configuration the main check never exercises on real TPU."""
    from noise_robust_vit_tpu.ops import dot_product_attention
    from noise_robust_vit_tpu.ops.pallas.biased_attention import (
        biased_attention,
        biased_attention_supported,
    )

    bw, h, n, d, dv = (8, 2, 17, 16, 16) if interpret else (32, 3, 49, 64, 64)
    assert biased_attention_supported(bw, h, n, d, dv, 1)

    def reference(q, k, v, robust, iters, final_row):
        return dot_product_attention(
            q, k, v, scale=d**-0.5, robust=robust, sinkhorn_iters=iters,
            final_row_norm=final_row, use_pallas=False,
        )

    zero_bias = jnp.zeros((1, h, n, n), jnp.float32)
    cases = [("plain", False, 3, True)] + [
        (f"sched=({i},{int(f)})", True, i, f) for i, f in SCHEDULES
    ]

    @jax.jit
    def run(q, k, v, tang):
        errs = {}
        for tag, robust, iters, final_row in cases:

            def kfn(q, k, v):
                return biased_attention(q, k, v, zero_bias, d**-0.5, robust,
                                        iters, final_row, 1, interpret,
                                        no_bias=True)

            def rfn(q, k, v):
                return reference(q, k, v, robust, iters, final_row)

            ok_, vjp_k = jax.vjp(kfn, q, k, v)
            or_, vjp_r = jax.vjp(rfn, q, k, v)
            errs[f"{tag} fwd"] = _err(ok_, or_, FWD_ATOL, FWD_RTOL)
            for name, a, b in zip(("dq", "dk", "dv"), vjp_k(tang),
                                  vjp_r(tang)):
                errs[f"{tag} bwd {name}"] = _err(a, b, BWD_ATOL, BWD_RTOL)
        return errs

    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(keys[0], (bw, h, n, d), jnp.float32)
    k = jax.random.normal(keys[1], (bw, h, n, d), jnp.float32)
    v = jax.random.normal(keys[2], (bw, h, n, dv), jnp.float32)
    tang = jax.random.normal(keys[3], (bw, h, n, dv), jnp.float32)
    _report(f"nobias N={n} DV={dv}", jax.device_get(run(q, k, v, tang)))


def check_sinkhorn_softmax(interpret: bool):
    """Logits-interface kernel at the matrix-transforming models' shipping
    geometry (CaiT/DeepViT-class [B, H, 197, 197] logits); both schedules,
    fwd + dlogits, one compiled program."""
    from noise_robust_vit_tpu.ops.sinkhorn import sinkhorn_normalize
    from noise_robust_vit_tpu.ops.pallas.sinkhorn_softmax import (
        sinkhorn_softmax,
        sinkhorn_softmax_supported,
    )

    shape = (2, 2, 36, 36) if interpret else (4, 6, 197, 197)

    def reference(logits, iters, final_row):
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return sinkhorn_normalize(attn, num_iters=iters,
                                  final_row_norm=final_row)

    @jax.jit
    def run(logits, tang):
        errs = {}
        for iters, final_row in SCHEDULES:
            assert sinkhorn_softmax_supported(shape, iters)
            tag = f"sched=({iters},{int(final_row)})"

            def kfn(s):
                return sinkhorn_softmax(s, iters, final_row, interpret)

            def rfn(s):
                return reference(s, iters, final_row)

            ok_, vjp_k = jax.vjp(kfn, logits)
            or_, vjp_r = jax.vjp(rfn, logits)
            errs[f"{tag} fwd"] = _err(ok_, or_, FWD_ATOL, FWD_RTOL)
            (gk,), (gr,) = vjp_k(tang), vjp_r(tang)
            errs[f"{tag} bwd dlogits"] = _err(gk, gr, BWD_ATOL, BWD_RTOL)
        return errs

    logits = jax.random.normal(jax.random.PRNGKey(3), shape,
                               jnp.float32) * 3.0
    tang = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    _report(f"sinkhorn_softmax {shape}", jax.device_get(run(logits, tang)))


def check_talking_heads(interpret: bool):
    """Fused talking-heads sandwich (pre-mix → Sinkhorn → post-mix, ref
    cait.py:110-119) at CaiT's shipping geometry ([B, 4, 196, 196] patch
    self-attention); both schedules, fwd + ddots/dpre/dpost, one compiled
    program."""
    from noise_robust_vit_tpu.ops.sinkhorn import sinkhorn_normalize
    from noise_robust_vit_tpu.ops.pallas.talking_heads import (
        talking_heads_sinkhorn,
        talking_heads_supported,
    )

    shape = (2, 2, 25, 25) if interpret else (4, 4, 196, 196)
    h = shape[1]

    def reference(dots, pre, post, iters, final_row):
        mixed = jnp.einsum("bhij,hg->bgij", dots, pre)
        attn = jax.nn.softmax(mixed.astype(jnp.float32), axis=-1)
        attn = sinkhorn_normalize(attn, num_iters=iters,
                                  final_row_norm=final_row)
        return jnp.einsum("bhij,hg->bgij", attn, post)

    @jax.jit
    def run(dots, pre, post, tang):
        errs = {}
        for iters, final_row in SCHEDULES:
            assert talking_heads_supported(shape, iters)
            tag = f"sched=({iters},{int(final_row)})"

            def kfn(s, p, q):
                return talking_heads_sinkhorn(s, p, q, iters, final_row,
                                              interpret)

            def rfn(s, p, q):
                return reference(s, p, q, iters, final_row)

            ok_, vjp_k = jax.vjp(kfn, dots, pre, post)
            or_, vjp_r = jax.vjp(rfn, dots, pre, post)
            errs[f"{tag} fwd"] = _err(ok_, or_, FWD_ATOL, FWD_RTOL)
            for name, a, b in zip(("ddots", "dpre", "dpost"),
                                  vjp_k(tang), vjp_r(tang)):
                errs[f"{tag} bwd {name}"] = _err(a, b, BWD_ATOL, BWD_RTOL)
        return errs

    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    dots = jax.random.normal(keys[0], shape, jnp.float32) * 2.0
    pre = jax.random.normal(keys[1], (h, h), jnp.float32)
    post = jax.random.normal(keys[2], (h, h), jnp.float32)
    tang = jax.random.normal(keys[3], shape, jnp.float32)
    _report(f"talking_heads {shape}",
            jax.device_get(run(dots, pre, post, tang)))


def check_rect(interpret: bool):
    """Rectangular logits-interface kernel (CvT stride-reduced / Twins
    subsampled cross-attention, ref cvt.py:70-102, twins_svt.py:122-153) at
    CvT's stage-2 geometry [B·H, 784, 196] plus the transposed orientation;
    both schedules, fwd + ds, one compiled program."""
    from noise_robust_vit_tpu.ops.sinkhorn import sinkhorn_normalize
    from noise_robust_vit_tpu.ops.pallas.sinkhorn_softmax import (
        sinkhorn_softmax_rect,
        sinkhorn_softmax_rect_supported,
    )

    # the third shape is the Twins-s2 tall/narrow class [r, 784, 16] whose
    # 8× lane padding (nc 16 → 128) broke the round-4 un-padded VMEM model:
    # it gates BOTH directions' group pickers on the chip (the fwd picker
    # extrapolates the bwd-calibrated 2× live-buffer multiplier — a fwd
    # under-count would OOM scoped VMEM here at compile time)
    shapes = [(2, 2, 25, 10), (2, 10, 25), (4, 40, 8)] if interpret else [
        (2, 3, 784, 196), (4, 196, 784), (128, 784, 16)]

    def reference(s, iters, final_row):
        attn = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        return sinkhorn_normalize(attn, num_iters=iters,
                                  final_row_norm=final_row)

    for shape in shapes:
        @jax.jit
        def run(s, tang):
            errs = {}
            for iters, final_row in SCHEDULES:
                assert sinkhorn_softmax_rect_supported(shape, iters)
                tag = f"sched=({iters},{int(final_row)})"

                def kfn(x):
                    return sinkhorn_softmax_rect(x, iters, final_row,
                                                 interpret)

                def rfn(x):
                    return reference(x, iters, final_row)

                ok_, vjp_k = jax.vjp(kfn, s)
                or_, vjp_r = jax.vjp(rfn, s)
                errs[f"{tag} fwd"] = _err(ok_, or_, FWD_ATOL, FWD_RTOL)
                errs[f"{tag} bwd"] = _err(vjp_k(tang)[0], vjp_r(tang)[0],
                                          BWD_ATOL, BWD_RTOL)
            return errs

        keys = jax.random.split(jax.random.PRNGKey(7), 2)
        s = jax.random.normal(keys[0], shape, jnp.float32) * 2.0
        tang = jax.random.normal(keys[1], shape, jnp.float32)
        _report(f"rect {shape}", jax.device_get(run(s, tang)))


def check_streaming(interpret: bool):
    """Streaming q/k/v-interface Sinkhorn kernel (giant-N robust path,
    ops/pallas/streaming_sinkhorn.py) at CvT stage-1 geometry [B,1,3136,784]
    and the Twins tall/narrow global stage [B,8,784,49]; fwd + dq/dk/dv vs
    the XLA vector form, both schedules, one compiled program per shape."""
    from noise_robust_vit_tpu.ops.pallas.streaming_sinkhorn import (
        streaming_attention,
        streaming_supported,
    )
    from noise_robust_vit_tpu.ops.sinkhorn import sinkhorn_normalize

    # (b, h, n, m, d)
    shapes = [(1, 1, 70, 30, 16), (1, 2, 30, 70, 8)] if interpret else [
        (2, 1, 3136, 784, 64), (2, 8, 784, 49, 64)]

    def reference(q, k, v, scale, iters, final_row):
        s = (q @ jnp.swapaxes(k, -1, -2) * scale).astype(jnp.float32)
        attn = jax.nn.softmax(s, axis=-1)
        attn = sinkhorn_normalize(attn, num_iters=iters,
                                  final_row_norm=final_row)
        return attn @ v.astype(jnp.float32)

    for shape in shapes:
        b, h, n, m, d = shape
        assert streaming_supported(b, h, n, m, d)
        scale = d**-0.5

        @jax.jit
        def run(q, k, v, tang):
            errs = {}
            for iters, final_row in SCHEDULES:
                tag = f"sched=({iters},{int(final_row)})"

                def kfn(q, k, v):
                    return streaming_attention(q, k, v, scale, iters,
                                               final_row, interpret)

                def rfn(q, k, v):
                    return reference(q, k, v, scale, iters, final_row)

                ok_, vjp_k = jax.vjp(kfn, q, k, v)
                or_, vjp_r = jax.vjp(rfn, q, k, v)
                errs[f"{tag} fwd"] = _err(ok_, or_, FWD_ATOL, FWD_RTOL)
                gk, gr = vjp_k(tang), vjp_r(tang)
                for name, a, b_ in zip("qkv", gk, gr):
                    errs[f"{tag} d{name}"] = _err(a, b_, BWD_ATOL, BWD_RTOL)
            return errs

        keys = jax.random.split(jax.random.PRNGKey(11), 4)
        q = jax.random.normal(keys[0], (b, h, n, d), jnp.float32)
        k = jax.random.normal(keys[1], (b, h, m, d), jnp.float32)
        v = jax.random.normal(keys[2], (b, h, m, d), jnp.float32)
        tang = jax.random.normal(keys[3], (b, h, n, d), jnp.float32)
        _report(f"streaming {shape}", jax.device_get(run(q, k, v, tang)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode dry run (script validation "
                    "only — the point of this gate is the real chip)")
    ap.add_argument("--only",
                    choices=("packed", "biased", "nobias", "sinkhorn",
                             "talking", "rect", "streaming"),
                    help="run a single kernel's check")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    if not args.interpret and backend not in ("tpu", "axon"):
        print(f"WARNING: backend is {backend!r}, not a TPU — Mosaic lowering "
              "is NOT being exercised; pass --interpret if this is intended")
    print(f"backend={backend} interpret={args.interpret}", flush=True)

    checks = {"packed": check_packed, "biased": check_biased,
              "nobias": check_nobias,
              "sinkhorn": check_sinkhorn_softmax,
              "talking": check_talking_heads, "rect": check_rect,
              "streaming": check_streaming}
    if args.only:
        checks = {args.only: checks[args.only]}
    t0 = time.perf_counter()
    # the XLA reference must run at highest matmul precision or MXU
    # fast-precision noise dominates the comparison (RESULTS.md parity)
    with jax.default_matmul_precision("highest"):
        for name, fn in checks.items():
            print(f"== {name} ==", flush=True)
            t1 = time.perf_counter()
            fn(args.interpret)
            print(f"  ({time.perf_counter() - t1:.0f}s)", flush=True)
    dt = time.perf_counter() - t0
    if _FAILURES:
        print(f"\nFAILED ({len(_FAILURES)}): " + "; ".join(_FAILURES))
        sys.exit(1)
    print(f"\nALL KERNEL CHECKS PASS ({dt:.0f}s)")


if __name__ == "__main__":
    main()
