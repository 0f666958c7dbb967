"""Sweep aggregation — the reader_*.py family as one preset-driven tool
(ref examples/reader_baseline.py:14-27, reader_scaling.py:30-50,
reader_BS_CV.py:36-75, reader_DA.py:31-60, reader_smoothing_CV.py,
reader_epochs_CV.py, reader_IN.py, reader_arch.py, reader_small_datasets.py).

Each reference reader gathers a sweep folder, groups runs by one or two
hyperparameters, reports best-accuracy mean±std per cell, and renders a
figure. ``--preset NAME`` reproduces the corresponding table/figure for the
matching ``executor_NAME.sh`` sweep; the generic flags (``--group-by`` /
``--cols-by`` / ``--metric``) cover ad-hoc layouts (reader_V0/V1/SMART/1000
are folder-specific instances of the same pivots).
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from noise_robust_vit_tpu.train import gather_runs

# preset -> (rows hparam, cols hparam or None, metric, log name)
# mirrors the grouping of the same-named reference reader_*.py
PRESETS = {
    "BS_CV": ("batch_size", None, "accus", "eval_accuracies"),
    "epochs_CV": ("epochs", "architecture", "accus", "eval_accuracies"),
    "smoothing_CV": ("label_smoothing", "architecture", "accus", "eval_accuracies"),
    "lsmoothing_CV": ("label_smoothing", "architecture", "accus", "eval_accuracies"),
    "scaling": ("lr_scaling", "wd_scaling", "accus", "eval_accuracies"),
    "IN": ("dataset", "architecture", "accus", "eval_accuracies"),
    "DA": ("strength", "architecture", "accus", "eval_accuracies"),
    "CIFAR": ("architecture", "robust", "accus", "eval_accuracies"),
    "SMALL_DATASETS": ("dataset", "architecture", "accus", "eval_accuracies"),
    "arch": ("architecture", "dataset", "accus", "eval_accuracies"),
    "long": ("epochs", "architecture", "accus", "eval_accuracies"),
    "many": ("max_num_models", None, "accus", "eval_accuracies"),
    "sup_ssl": ("temperature", None, "accus", "eval_accuracies"),
    "noise": ("noise_std", "improved", "accus", "eval_accuracies"),
    "baseline": (None, None, "accus", "eval_accuracies"),  # leaderboard
}

# the randomized dimensions of executor_baseline.sh, shown as leaderboard
# columns (ref reader_baseline.py prints hparams alongside curves)
BASELINE_COLS = (
    "architecture", "loss", "projector_depth", "projector_width", "proba",
    "label_smoothing", "optimizer", "weight_decay", "batch_size",
    "learning_rate",
)


def _best(run, log, metric):
    rows = run.get(log, [])
    vals = [float(r[metric]) for r in rows if metric in r]
    return max(vals) if vals else None


def _key(run, hparam):
    v = run["hparams"].get(hparam, "?")
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def leaderboard(runs, metric, log, top=20):
    """executor_baseline-style random-search leaderboard
    (ref reader_baseline.py, reader_1000.py)."""
    scored = []
    for run in runs:
        best = _best(run, log, metric)
        if best is not None:
            scored.append((best, run))
    scored.sort(key=lambda t: -t[0])
    header = ["best"] + [c[:12] for c in BASELINE_COLS]
    widths = [8] + [12] * len(BASELINE_COLS)
    print("  ".join(h.ljust(w) for h, w in zip(header, widths)))
    for best, run in scored[:top]:
        cells = [f"{best:.4f}"] + [
            str(run["hparams"].get(c, "?"))[:12] for c in BASELINE_COLS
        ]
        print("  ".join(c.ljust(w) for c, w in zip(cells, widths)))
    return scored


def pivot(runs, rows_by, cols_by, metric, log):
    """mean±std of per-run best metric over a 1D or 2D hparam grid
    (ref reader_scaling.py:30-50 builds exactly this lr×wd pivot)."""
    cells = defaultdict(list)
    for run in runs:
        best = _best(run, log, metric)
        if best is None:
            continue
        ckey = _key(run, cols_by) if cols_by else ""
        cells[(_key(run, rows_by), ckey)].append(best)
    # type-stable sort: _key yields floats for numeric hparams but "?" for
    # runs missing one — a mixed float/str sorted() raises TypeError
    by_type = lambda k: (isinstance(k, str), k)
    rkeys = sorted({r for r, _ in cells}, key=by_type)
    ckeys = sorted({c for _, c in cells}, key=by_type)
    table = np.full((len(rkeys), len(ckeys)), np.nan)
    for (r, c), vals in cells.items():
        table[rkeys.index(r), ckeys.index(c)] = float(np.mean(vals))
    return rkeys, ckeys, table, cells


def print_pivot(rows_by, cols_by, rkeys, ckeys, table, cells):
    head = f"{rows_by:<20}"
    if cols_by:
        head += " | " + "  ".join(f"{cols_by}={c!s:>12}" for c in ckeys)
    else:
        head += f" | {'mean':>10} {'std':>8} {'n':>4}"
    print(head)
    print("-" * len(head))
    for i, r in enumerate(rkeys):
        line = f"{r!s:<20} |"
        if cols_by:
            for j, c in enumerate(ckeys):
                v = table[i, j]
                line += f" {'--' if np.isnan(v) else format(v, '.4f'):>15}"
        else:
            vals = cells[(r, "")]
            line += (f" {np.mean(vals):>10.4f} {np.std(vals):>8.4f} "
                     f"{len(vals):>4}")
        print(line)


def plot_pivot(path, rows_by, cols_by, rkeys, ckeys, table):
    """Figure per preset: 2D pivots render a heatmap (reader_scaling), 1D a
    best-accuracy line (reader_BS_CV's accuracy-vs-batch-size panel)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    if cols_by and len(ckeys) > 1:
        im = ax.imshow(table, aspect="auto", cmap="viridis")
        ax.set_xticks(range(len(ckeys)), [str(c) for c in ckeys], rotation=45)
        ax.set_yticks(range(len(rkeys)), [str(r) for r in rkeys])
        ax.set_xlabel(cols_by)
        fig.colorbar(im, ax=ax)
    else:
        ax.plot(range(len(rkeys)), table[:, 0], "--o", linewidth=3, alpha=0.7)
        ax.set_xticks(range(len(rkeys)), [str(r) for r in rkeys], rotation=45)
        ax.set_ylabel("best accuracy")
        ax.grid(True, linestyle=":", linewidth=0.5)
    ax.set_title(rows_by if not cols_by else f"{rows_by} × {cols_by}")
    ax.set_xlabel(ax.get_xlabel() or rows_by)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    print(f"saved figure to {path}")


def main(args):
    if args.preset:
        rows_by, cols_by, metric, log = PRESETS[args.preset]
        metric, log = args.metric or metric, args.log or log
    else:
        rows_by, cols_by = args.group_by, args.cols_by
        metric, log = args.metric or "accus", args.log or "eval_accuracies"
    runs = gather_runs(args.folder, verbose=args.verbose)
    if not runs:
        print(f"no runs under {args.folder}")
        return None
    if args.preset == "baseline" or rows_by is None:
        return leaderboard(runs, metric, log, top=args.top)
    rkeys, ckeys, table, cells = pivot(runs, rows_by, cols_by, metric, log)
    print_pivot(rows_by, cols_by, rkeys, ckeys, table, cells)
    if args.plot:
        plot_pivot(args.plot, rows_by, cols_by, rkeys, ckeys, table)
    return rkeys, ckeys, table


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="sweep reader")
    parser.add_argument("--folder", type=Path, required=True)
    parser.add_argument("--preset", type=str, default=None,
                        choices=sorted(PRESETS))
    parser.add_argument("--group-by", type=str, default="architecture")
    parser.add_argument("--cols-by", type=str, default=None)
    parser.add_argument("--metric", type=str, default=None)
    parser.add_argument("--log", type=str, default=None)
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--plot", type=Path, default=None)
    parser.add_argument("--verbose", action="store_true")
    main(parser.parse_args())
