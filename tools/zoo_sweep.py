"""Resumable zoo sweep driver (VERDICT-r4 #4 + #5).

Round 4's binding constraint was tunnel-compile bleed: every sweep ran as
ad-hoc shell loops, a >900 s compile timeout threw away the whole session's
work, and re-runs re-paid every compile. This driver fixes the workflow:

* one cell per subprocess (tools/zoo_bench.py — back-to-back large compiles
  over the tunnel are slow, CLAUDE.md), each under its own timeout;
* results append to ``tools/zoo_results.jsonl``; on restart, cells with a
  recorded result are SKIPPED, so a dead tunnel or a timeout costs one cell,
  not the sweep (``--retry-errors`` re-runs error cells too);
* zoo_bench enables the persistent XLA compilation cache, so even a re-run
  of a completed cell skips the compile.

Usage:
  python tools/zoo_sweep.py            # run all pending cells
  python tools/zoo_sweep.py --new-only # only archs with no round-4 numbers
  python tools/zoo_sweep.py --retry-errors
  python tools/zoo_sweep.py --flops    # CPU: fill gflops rows (zoo_flops)
  python tools/zoo_sweep.py --table    # print the merged markdown table
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
RESULTS = HERE / "zoo_results.jsonl"

# (arch, batch, image, timeout_s). Timeouts are generous: maxvit_t vanilla
# needed >900 s to compile in round 4; the persistent cache makes retries
# cheap but the FIRST compile still pays full price.
NEW_ARCHS = [
    ("pit_small", 128, 224, 1800),
    # cross_vit: sm_patch 12 needs image % 12 == 0; scalable_vit's stage-1
    # window 64 needs a 64-wide stage-1 map (256 input) — both as upstream
    ("cross_vit_small", 128, 240, 1800),
    ("crossformer_small", 128, 224, 2400),
    # cheap cells first (tiny images / plain ViT graphs compile fast), the
    # window-heavy hierarchical archs last — a resumable sweep interrupted
    # mid-queue then still maximizes table coverage.
    # cct_7's tokenizer (3x1 conv, as upstream) keeps N = (img/2)^2: at 224
    # that is 12544 tokens -> a [B,H,12544,12544] attention matrix, infeasible
    # on 16 GB HBM in either mode (the torch reference OOMs identically).
    # Bench at the architecture's CIFAR design point instead.
    ("cct_7", 256, 32, 1200),
    ("small_dataset_vit", 256, 64, 1200),
    ("local_vit", 128, 224, 1800),
    ("t2t_vit", 128, 224, 1800),
    ("ats_vit", 128, 224, 1800),
    ("mobile_vit_xs", 128, 256, 1800),
    ("scalable_vit_small", 128, 256, 2400),
    ("sep_vit_small", 128, 224, 2400),
    ("regionvit_small", 128, 224, 2400),
]
ROUND4_ARCHS = [
    ("simple_vit_b16", 256, 224, 1200),
    ("vit_b_16", 256, 224, 1200),
    ("swin_t", 128, 224, 1800),
    ("LeViT_128S", 256, 224, 1800),
    ("cait", 128, 224, 1200),
    ("deepvit", 128, 224, 1200),
    ("nest_tiny", 128, 224, 1800),
    ("rvt_small", 128, 224, 1800),
    ("cvt_13", 128, 224, 1800),
    ("twins_svt_small", 128, 224, 3600),
    ("maxvit_t", 128, 224, 3600),
]


def cells(new_only: bool):
    archs = NEW_ARCHS + ([] if new_only else ROUND4_ARCHS)
    for arch, bs, img, to in archs:
        for mode in ("vanilla", "robust"):
            yield {"arch": arch, "mode": mode, "batch": bs, "image": img,
                   "timeout": to}


def _key(c) -> str:
    return f"{c['arch']}:{c.get('mode', 'flops')}:{c['batch']}:{c['image']}"


def _load():
    recs = []
    if RESULTS.exists():
        for line in RESULTS.read_text().splitlines():
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def _append(rec) -> None:
    with RESULTS.open("a") as f:
        f.write(json.dumps(rec) + "\n")


def run_cell(c) -> dict:
    cmd = [sys.executable, str(HERE / "zoo_bench.py"), c["arch"], c["mode"],
           str(c["batch"]), str(c["image"])]
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=c["timeout"])
    except subprocess.TimeoutExpired:
        return {**{k: c[k] for k in ("arch", "mode", "batch", "image")},
                "error": f"timeout>{c['timeout']}s"}
    dur = round(time.time() - t0, 1)
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            rec["mode"] = c["mode"]
            rec["wall_s"] = dur
            return rec
    tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
    return {**{k: c[k] for k in ("arch", "mode", "batch", "image")},
            "error": f"rc={out.returncode}: " + " | ".join(tail)[-300:]}


def run_flops(new_only: bool) -> None:
    done = {r["arch"] for r in _load() if "gflops_fwd_per_img" in r}
    seen = set()
    for c in cells(new_only):
        arch, img = c["arch"], c["image"]
        if arch in done or arch in seen:
            continue
        seen.add(arch)
        cmd = [sys.executable, str(HERE / "zoo_flops.py"), arch, str(img)]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=900)
        except subprocess.TimeoutExpired:
            err = {"arch": arch, "image": img, "error": "flops timeout>900s"}
            _append(err)
            print(json.dumps(err), flush=True)
            continue
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                rec = json.loads(line)
                _append(rec)
                print(json.dumps(rec), flush=True)
                break
        else:
            err = {"arch": arch, "image": img, "error":
                   (out.stderr.strip().splitlines() or ["no output"])[-1][-300:]}
            _append(err)
            print(json.dumps(err), flush=True)


def print_table() -> None:
    recs = _load()
    perf: dict[tuple, dict] = {}
    flops: dict[str, float] = {}
    for r in recs:
        if "gflops_fwd_per_img" in r:
            if r["gflops_fwd_per_img"] is not None:
                flops[r["arch"]] = r["gflops_fwd_per_img"]
        elif "img_per_sec" in r:
            perf[(r["arch"], r["mode"])] = r
    paths: dict[str, str] = {}
    audit = HERE / "dispatch_audit.jsonl"
    if audit.exists():
        for line in audit.read_text().splitlines():
            if not line.strip():
                continue
            a = json.loads(line)
            if "robust_paths" in a:
                tags = sorted(a["robust_paths"])
                paths[a["arch"]] = "+".join(tags) if tags else "(none)"
    peak = 197e12
    print("| model | bs | img | vanilla img/s | robust img/s | rob/van"
          " | vanilla MFU | robust path |")
    print("|---|---|---|---|---|---|---|---|")
    for arch, bs, img, _ in NEW_ARCHS + ROUND4_ARCHS:
        v = perf.get((arch, "vanilla"))
        r = perf.get((arch, "robust"))
        vs = f"{v['img_per_sec']:.1f}" if v else "—"
        rs = f"{r['img_per_sec']:.1f}" if r else "—"
        ratio = f"{r['img_per_sec'] / v['img_per_sec']:.2f}" if v and r else "—"
        mfu = "—"
        if v and arch in flops:
            mfu = f"{3 * flops[arch] * 1e9 * v['img_per_sec'] / peak * 100:.1f}%"
        print(f"| {arch} | {bs} | {img} | {vs} | {rs} | {ratio} | {mfu}"
              f" | {paths.get(arch, '—')} |")


def main() -> None:
    args = set(sys.argv[1:])
    if "--table" in args:
        print_table()
        return
    new_only = "--new-only" in args
    if "--flops" in args:
        run_flops(new_only)
        return
    retry = "--retry-errors" in args
    recs = _load()
    done = {_key(r) for r in recs
            if "mode" in r and ("error" not in r or not retry)}
    for c in cells(new_only):
        if _key(c) in done:
            continue
        print(f"--- {_key(c)} (timeout {c['timeout']}s)", flush=True)
        rec = run_cell(c)
        _append(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
