"""FSDP-style (ZeRO-3) parameter sharding over the ``data`` mesh axis.

Beyond the reference (DP-only, SURVEY.md §2.5): every parameter (and its
optimizer moments, which inherit the same sharding through pjit) is sharded
over the ``data`` axis along its largest divisible dimension, so per-chip
parameter + optimizer memory shrinks by the data-parallel degree. XLA GSPMD
turns the use of a sharded parameter inside a data-parallel ``jit`` into an
all-gather right before the consuming matmul and a reduce-scatter of its
gradient — the standard ZeRO-3 schedule — riding ICI, with no model-code
changes.

Compose with tensor parallelism by passing ``rules`` (the TP rules claim
their kernels' ``model`` axis first; everything else falls to FSDP).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tp import _spec_for

__all__ = ["fsdp_param_shardings", "shard_params_fsdp"]

# parameters smaller than this stay replicated — gathering a tiny LayerNorm
# scale costs more latency than its memory is worth
_MIN_SHARD_ELEMS = 16384


def _fsdp_spec(leaf, axis_size: int, base: P) -> P:
    """Shard the largest dimension not already claimed by ``base`` (a TP
    spec) over ``data``, if divisible and the leaf is big enough."""
    if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.size < _MIN_SHARD_ELEMS:
        return base
    names = list(base) + [None] * (leaf.ndim - len(list(base)))
    order = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
    for dim in order:
        if names[dim] is None and leaf.shape[dim] % axis_size == 0:
            names[dim] = "data"
            return P(*names)
    return base


def fsdp_param_shardings(
    params: Any,
    mesh: Mesh,
    tp_rules: Optional[Sequence] = None,
):
    """Pytree of NamedShardings: each large parameter sharded over ``data``
    along its largest divisible dim (ZeRO-3); optionally composed with
    tensor-parallel ``tp_rules`` over ``model``."""
    axis = mesh.shape.get("data", 1)

    def visit(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        base = _spec_for(keys, leaf, tp_rules) if tp_rules else P()
        if hasattr(leaf, "ndim"):
            for dim, name in enumerate(base):
                if name == "model" and leaf.shape[dim] % mesh.shape.get("model", 1):
                    base = P()
                    break
        return NamedSharding(mesh, _fsdp_spec(leaf, axis, base))

    return jax.tree_util.tree_map_with_path(visit, params)


def shard_params_fsdp(params: Any, mesh: Mesh, tp_rules: Optional[Sequence] = None):
    """device_put params with FSDP(+TP) shardings."""
    shardings = fsdp_param_shardings(params, mesh, tp_rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
