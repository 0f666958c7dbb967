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

__all__ = ["stack_layer_params", "pipeline_forward", "pipeline_shardings"]


def stack_layer_params(tf_params: dict, depth: int):
    """Restack a depth-``L`` ``models.layers.Transformer`` param dict into
    (stacked, rest): ``stacked`` is shaped like the depth-1 module's params
    with a leading ``[L]`` layer axis on every leaf (the pipeline's shard
    axis), ``rest`` holds the non-layer keys (e.g. the final norm)."""
    layers = [
        {
            "layers_0_attn": tf_params[f"layers_{i}_attn"],
            "layers_0_ff": tf_params[f"layers_{i}_ff"],
        }
        for i in range(depth)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in tf_params.items() if not k.startswith("layers_")}
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
