"""Sweep harvester + relauncher (ref examples/relauncher.py): scan past runs
with ``gather_runs``, pick the top-k configs by max probe accuracy, and
relaunch them at more epochs via subprocess (the reference's ``os.system``
submitit resubmission, ref relauncher.py:16-60)."""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from noise_robust_vit_tpu.train import gather_runs


def best_runs(folder, top_k=5, metric="accus"):
    runs = gather_runs(folder)
    scored = []
    for run in runs:
        rows = run.get("eval_accuracies", [])
        if not rows:
            continue
        best = max(float(r.get(metric, 0.0)) for r in rows)
        scored.append((best, run))
    scored.sort(key=lambda t: -t[0])
    return scored[:top_k]


def main(args):
    top = best_runs(args.folder, args.top_k, args.metric)
    for score, run in top:
        hp = run["hparams"]
        print(f"best={score:.4f}  {run['folder']}")
        if args.dry_run:
            continue
        cmd = [
            sys.executable, str(Path(__file__).parent / args.script),
            "--epochs", str(args.epochs),
            "--folder", str(Path(args.output) / Path(run["folder"]).name),
            "--architecture", str(hp.get("architecture", "simple_vit")),
            "--learning-rate", str(hp.get("learning_rate", 5e-4)),
            "--weight-decay", str(hp.get("weight_decay", 0.05)),
            "--batch-size", str(hp.get("batch_size", 256)),
        ]
        print("relaunch:", " ".join(cmd))
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="relaunch best sweep configs")
    parser.add_argument("--folder", type=Path, required=True)
    parser.add_argument("--output", type=Path, default=Path("./runs/relaunch"))
    parser.add_argument("--script", type=str, default="classification.py")
    parser.add_argument("--metric", type=str, default="accus")
    parser.add_argument("--top-k", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--dry-run", action="store_true")
    main(parser.parse_args())
