"""Profiling and FLOPs accounting (SURVEY.md §5 "tracing/profiling").

The reference's observability is ad-hoc: cudnn.benchmark toggles
(ref sup_ssl.py:8-10), an analytic LeViT FLOPS_COUNTER (ref levit.py:54), and
hook-based recorders. TPU-native equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-compatible trace directory.
  * :func:`xla_flops` — exact compiled-FLOPs from XLA's cost analysis (the
    real counterpart of the hand-maintained counter).
  * :func:`summarize_params` — parameter counts per top-level module.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
import numpy as np

__all__ = ["trace", "xla_flops", "summarize_params"]


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/tb"): step()`` → profile in TensorBoard format."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def xla_flops(fn: Callable, *args, **kwargs) -> float | None:
    """FLOPs of ``fn(*args)`` as reported by XLA's cost analysis of the
    compiled executable; None when the backend doesn't expose it."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else {}
    return float(analysis.get("flops", 0.0)) or None


def summarize_params(params: Any) -> dict[str, int]:
    """{top-level module: parameter count}, plus a ``total``."""
    out: dict[str, int] = {}
    top = params.get("params", params)
    for name, sub in top.items():
        out[name] = int(
            sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(sub))
        )
    out["total"] = int(sum(v for k, v in out.items()))
    return out
