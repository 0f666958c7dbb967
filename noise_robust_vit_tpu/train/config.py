"""Config/flag system — argparse-compatible with the reference's omega flags.

``make_config(parser)`` appends the standard trainer/infra flags that
``omega.argparse.make_config`` injects in every experiment script
(reconstructed from call sites, SURVEY.md §2.4: ref randomlabel.py:407-411,
executor_SMALL_DATASETS.sh:23, CIFAR100.py:171-198). Run folders get a
``hparams.json`` so sweeps can be aggregated by ``gather_runs``.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

__all__ = ["make_config", "save_hparams", "find_version", "honor_platform_env"]


def honor_platform_env() -> None:
    """Re-assert an explicit ``JAX_PLATFORMS`` env var over any sitecustomize
    that force-set ``jax_platforms`` at interpreter start (the axon preset
    pins "axon,cpu"; env vars alone are then ignored — CLAUDE.md env quirks).
    Called before the backend is initialized, so sweep cells and tests can run
    experiment scripts on CPU with ``JAX_PLATFORMS=cpu``."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)


def _str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "y")


def make_config(parser: argparse.Namespace | argparse.ArgumentParser):
    """Append standard flags and parse. Mirrors ``omega.argparse.make_config``.

    Returns the parsed ``argparse.Namespace``; creates ``--folder`` (with an
    auto-versioned subfolder when ``--add-version``) and records hparams.
    """
    g = parser.add_argument_group("trainer")
    g.add_argument("--folder", type=Path, default=Path("./runs/default"))
    g.add_argument("--add-version", action="store_true")
    g.add_argument("--epochs", type=int, default=100)
    g.add_argument("--batch-size", type=int, default=256)
    g.add_argument("--learning-rate", type=float, default=5e-4)
    g.add_argument("--weight-decay", type=float, default=0.05)
    g.add_argument("--beta1", type=float, default=0.9)
    g.add_argument("--beta2", type=float, default=0.999)
    g.add_argument("--momentum", type=float, default=0.9)
    g.add_argument("--grad-max-norm", type=float, default=None)
    g.add_argument("--optimizer", type=str, default="adamw")
    g.add_argument("--scheduler", type=str, default="warmup_cosine")
    g.add_argument("--label-smoothing", type=float, default=0.0)
    g.add_argument("--float16", type=_str2bool, default=False,
                   help="bf16 compute on TPU (the reference's fp16 flag)")
    g.add_argument("--sync-batchnorm", type=_str2bool, default=True,
                   help="global-batch BN stats; free under jit DP")
    g.add_argument("--eval-each-epoch", type=_str2bool, default=True)
    g.add_argument("--parallelism", type=str, default="dp",
                   choices=("dp", "fsdp", "tp", "tp_fsdp", "pp", "dp_pp"),
                   help="state placement over the mesh: dp replicates (the "
                        "reference's DDP), fsdp=ZeRO-3 shards params+opt "
                        "moments over data, tp adds Megatron kernel "
                        "shardings over a model axis, pp/dp_pp pipeline the "
                        "transformer depth (GPipe) over a pipe axis, hybrid "
                        "with data parallelism on the remaining devices "
                        "(parallel/)")
    g.add_argument("--tp-degree", type=int, default=2,
                   help="model-axis size for --parallelism tp/tp_fsdp")
    g.add_argument("--pp-degree", type=int, default=4,
                   help="pipe-axis size for --parallelism pp/dp_pp")
    g.add_argument("--checkpoint-frequency", type=int, default=0)
    g.add_argument("--save-final-model", type=_str2bool, default=False)
    g.add_argument("--architecture", type=str, default="simple_vit")
    g.add_argument("--dataset-path", type=Path, default=None)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--num-workers", type=int, default=4)
    # infra flags kept for CLI compatibility with the reference's SLURM sweeps
    # (no-ops on a TPU pod slice; the launcher owns topology)
    g.add_argument("--gpus-per-node", type=int, default=0)
    g.add_argument("--num-nodes", type=int, default=1)
    g.add_argument("--timeout-min", type=int, default=0)
    g.add_argument("--slurm-partition", type=str, default="")
    g.add_argument("--process-name", type=str, default="")
    honor_platform_env()
    args = parser.parse_args()

    if args.add_version:
        args.folder = args.folder / find_version(args.folder)
    args.folder.mkdir(parents=True, exist_ok=True)
    save_hparams(args)
    return args


def find_version(folder: Path) -> str:
    """Next unused ``versionN`` subfolder (the reference's --add-version)."""
    i = 0
    while (folder / f"version{i}").exists():
        i += 1
    return f"version{i}"


def save_hparams(args) -> None:
    payload = {
        k: (str(v) if isinstance(v, Path) else v) for k, v in vars(args).items()
    }
    with open(args.folder / "hparams.json", "w") as f:
        json.dump(payload, f, indent=2, default=str)
