"""JSON-lines run logging + sweep aggregation.

Replaces ``omega.Trainer.log_txt`` (JSON-lines per metric file in the run
folder) and ``omega.reader.gather_runs`` (scan run dirs → list of
{"hparams": dict, <name>: rows}) — SURVEY.md §2.4, call sites
ref CIFAR100.py:158-163, relauncher.py:16-27, reader_scaling.py:32-48.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable

__all__ = ["RunLogger", "gather_runs"]


class RunLogger:
    """Writes ``<name>.jsonl`` files into a run folder."""

    def __init__(self, folder: str | Path):
        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)

    def log_txt(self, name: str, **scalars) -> None:
        payload = {
            k: (v.item() if hasattr(v, "item") else v) for k, v in scalars.items()
        }
        with open(self.folder / f"{name}.jsonl", "a") as f:
            f.write(json.dumps(payload) + "\n")

    def read(self, name: str) -> list[dict]:
        path = self.folder / f"{name}.jsonl"
        if not path.exists():
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]


def gather_runs(
    folder: str | Path,
    filter: Callable[[dict], bool] | None = None,
    verbose: bool = False,
) -> list[dict]:
    """Scan a sweep folder for runs (dirs containing ``hparams.json``) and
    return ``[{"hparams": ..., "<metric-name>": [rows...]}, ...]``."""
    runs = []
    for hp_path in sorted(Path(folder).rglob("hparams.json")):
        run_dir = hp_path.parent
        with open(hp_path) as f:
            hparams = json.load(f)
        run = {"hparams": hparams, "folder": str(run_dir)}
        for jl in run_dir.glob("*.jsonl"):
            with open(jl) as f:
                run[jl.stem] = [json.loads(l) for l in f if l.strip()]
        if filter is not None and not filter(run):
            continue
        if verbose:
            print(f"gather_runs: {run_dir}")
        runs.append(run)
    return runs
