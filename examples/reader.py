"""Sweep aggregation (the reader_*.py family, e.g. ref examples/
reader_baseline.py:14-27, reader_scaling.py:30-50): gather runs, group by a
chosen hparam, tabulate best accuracies."""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from noise_robust_vit_tpu.train import gather_runs


def main(args):
    runs = gather_runs(args.folder, verbose=args.verbose)
    groups = defaultdict(list)
    for run in runs:
        rows = run.get(args.log, [])
        if not rows:
            continue
        best = max(float(r.get(args.metric, 0.0)) for r in rows)
        key = str(run["hparams"].get(args.group_by, "?"))
        groups[key].append((best, run["folder"]))
    print(f"{args.group_by:<24} {'n':>4} {'best':>8} {'mean':>8}")
    for key in sorted(groups):
        vals = [v for v, _ in groups[key]]
        print(f"{key:<24} {len(vals):>4} {max(vals):>8.4f} "
              f"{sum(vals) / len(vals):>8.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="sweep reader")
    parser.add_argument("--folder", type=Path, required=True)
    parser.add_argument("--group-by", type=str, default="architecture")
    parser.add_argument("--metric", type=str, default="accus")
    parser.add_argument("--log", type=str, default="eval_accuracies")
    parser.add_argument("--verbose", action="store_true")
    main(parser.parse_args())
