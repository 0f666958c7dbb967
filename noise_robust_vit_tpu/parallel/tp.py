"""Tensor-parallel sharding rules (beyond the reference, which is DP-only —
SURVEY.md §2.5).

Megatron-style layout for the transformer blocks expressed purely as
parameter shardings: the first GEMM of each pair (qkv / MLP fc1) is sharded
column-wise over the ``model`` axis, the second (attention out / MLP fc2)
row-wise, so activations stay sharded head-/hidden-wise between them and XLA
GSPMD inserts exactly one reduce-scatter/all-reduce per pair over ICI. No
model-code changes: rules map parameter paths → ``PartitionSpec`` and the
params are simply ``device_put`` with those shardings before ``jit``.
"""

from __future__ import annotations

import contextlib
import re
import threading
from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DEFAULT_TP_RULES",
    "tp_param_shardings",
    "shard_params",
    "tp_shardings_active",
    "constrain_activation",
]

_TP_CTX = threading.local()


@contextlib.contextmanager
def tp_shardings_active(mesh: Mesh):
    """While active (around the jit TRACE of a step), attention modules pin
    their head-sharded activations with ``with_sharding_constraint`` so the
    GSPMD partitioner keeps the Megatron layout instead of thrashing
    reshards (round-1 weak spot: involuntary full rematerialization
    warnings on every attention broadcast/div/transpose). Also valid for
    data-only meshes (FSDP/DP): axes missing from the mesh degrade to
    replicated, pinning activations batch-sharded."""
    prev = getattr(_TP_CTX, "mesh", None)
    _TP_CTX.mesh = mesh
    try:
        yield
    finally:
        _TP_CTX.mesh = prev


def constrain_activation(x, *axes: str | None):
    """``with_sharding_constraint(x, P(*axes))`` against the active TP mesh;
    identity when no TP mesh is active. Axis names not present in the mesh
    degrade to ``None`` (replicated) so specs can mention 'data' freely."""
    mesh = getattr(_TP_CTX, "mesh", None)
    if mesh is None:
        return x
    spec = P(*[a if (a is None or a in mesh.axis_names) else None
               for a in axes])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

# (module-path regex, PartitionSpec for the kernel). First match wins;
# biases of column-parallel layers shard with their kernel's output axis.
DEFAULT_TP_RULES: tuple[tuple[str, P], ...] = (
    # column-parallel: split the output features (heads / hidden)
    (r"(^|/)(to_qkv|to_q|to_kv|qkv|fc1|ff1)$", P(None, "model")),
    # row-parallel: split the input features; 'proj' only as an attention
    # out-projection (NOT patch/embedding projections)
    (r"(^|/)(to_out|fc2|ff2)$", P("model", None)),
    (r"attn[^/]*/proj$", P("model", None)),
)


def _spec_for(path: Sequence[str], leaf, rules) -> P:
    if not hasattr(leaf, "ndim"):
        return P()
    name = path[-1]
    module_path = "/".join(path[:-1]) if name in ("kernel", "bias") else "/".join(path)
    for pattern, spec in rules:
        if re.search(pattern, module_path):
            if name == "kernel" and leaf.ndim == 2:
                return spec
            if name == "bias" and leaf.ndim == 1 and spec == P(None, "model"):
                return P("model")
            return P()
    return P()


def tp_param_shardings(params: Any, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """Pytree of NamedShardings matching ``params``: transformer GEMM kernels
    sharded over the ``model`` mesh axis per ``rules``; everything else
    replicated (well, sharded only over nothing — DP replication). A dim not
    divisible by the model-axis size falls back to replication, so this is
    safe over a whole TrainState (optimizer moments mirror the param paths
    and pick up the same specs)."""
    axis = mesh.shape.get("model", 1)

    def visit(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        spec = _spec_for(keys, leaf, rules)
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % axis:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(visit, params)


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """device_put params with TP shardings (divisibility permitting: a dim
    not divisible by the model-axis size falls back to replication)."""
    axis = mesh.shape.get("model", 1)

    def place(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        spec = _spec_for(keys, leaf, rules)
        # fall back to replication when the sharded dim doesn't divide
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % axis != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
