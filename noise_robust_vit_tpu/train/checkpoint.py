"""Checkpoint save/restore (Orbax) + load-time positional-embedding resize.

Replaces the reference's torch ``final.ckpt`` `{"model": state_dict}` flow
with DDP ``module.`` prefix stripping (ref evaluation.py:136-139) by flat
pytree checkpoints — no prefix surgery needed. The pos-embed interpolation of
ref vit.py:522-603 happens on load via ``ops.resize_posemb_grid``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _ckpt_dir(folder: str | Path) -> Path:
    return Path(folder).absolute() / "checkpoints"


def save_checkpoint(folder: str | Path, state: Any, step: int) -> Path:
    """Save a pytree checkpoint at ``<folder>/checkpoints/<step>``."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(folder) / str(step)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_step(folder: str | Path) -> int | None:
    d = _ckpt_dir(folder)
    if not d.exists():
        return None
    steps = [int(p.name) for p in d.iterdir() if p.name.isdigit()]
    return max(steps) if steps else None


def _align(raw: Any, like: Any) -> Any:
    """Fill ``like``'s structure from ``raw`` by matching dict keys; children
    of a TrainState's ``model_state`` (mutable collections like batch_stats)
    are also looked up at the top level so bare model variables restore from
    full train-state checkpoints."""
    if isinstance(like, dict):
        out = {}
        for k, v in like.items():
            if isinstance(raw, dict) and k in raw:
                out[k] = _align(raw[k], v)
            elif (
                isinstance(raw, dict)
                and isinstance(raw.get("model_state"), dict)
                and k in raw["model_state"]
            ):
                out[k] = _align(raw["model_state"][k], v)
            else:
                raise KeyError(
                    f"checkpoint has no entry for {k!r} "
                    f"(available: {list(raw) if isinstance(raw, dict) else type(raw)})"
                )
        return out
    return raw


def restore_checkpoint(folder: str | Path, like: Any, step: int | None = None,
                       key: str | None = None) -> Any:
    """Restore the checkpoint at ``step`` (default: latest) with the structure
    and shardings of ``like``. Returns ``None`` if no checkpoint exists.

    ``key`` selects a sub-tree of the checkpoint before aligning — the
    reference's ``--checkpoint_key`` for DINO-style teacher/student files
    (ref evaluate_copy_detection.py:380-384, :419-428). A missing key is
    ignored so plain checkpoints load unchanged."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(folder)
        if step is None:
            return None
    path = _ckpt_dir(folder) / str(step)
    abstract = jax.tree_util.tree_map(np.asarray, jax.device_get(like))
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            if key is not None:
                raise KeyError  # force the raw path so `key` can be applied
            restored = ckptr.restore(path, item=abstract)
        except Exception:
            # structure mismatch — e.g. the checkpoint is a full TrainState
            # (params/opt_state/model_state/step) but ``like`` is just model
            # variables ({"params", "batch_stats", ...}). Restore raw and
            # align by key (model_state children are hoisted to the top).
            raw = ckptr.restore(path)
            if key is not None and isinstance(raw, dict) and key in raw:
                raw = raw[key]
            restored = _align(raw, abstract)
    shardings = jax.tree_util.tree_map(
        lambda x: x.sharding if hasattr(x, "sharding") else None, like
    )

    def _place(x, s):
        return jax.device_put(x, s) if s is not None else x

    return jax.tree_util.tree_map(_place, restored, shardings)
