"""Normalization variants for Gaussian-noise robustness training
(ref examples/nowak.py:13-48).

``PartialBatchNorm`` expects the batch laid out as ``[noisy; clean]`` halves
(the nowak experiment forwards ``cat([x+ε, x])``, ref nowak.py:153-154 —
note the reference's Partial* modules treat the FIRST half as the "clean"
statistics source, and nowak feeds ``[x+ε, x]``, so statistics come from the
noisy half; the layout is preserved exactly).

TPU note: the reference computes first-half moments locally and all_reduces
them across ranks (nowak.py:22-27 — hand-rolled sync-BN). Under jit data
parallelism the batch the op sees IS the global batch, so plain reductions
over the first half give the identical cross-replica statistics with the
collective inserted by XLA.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PartialBatchNorm", "partial_relu"]


class PartialBatchNorm(nn.Module):
    """SyncBatchNorm on the first half; second half normalized with the
    first half's batch statistics (ref nowak.py:13-33)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        n = x.shape[0] // 2
        first, second = x[:n], x[n:]
        bn = nn.BatchNorm(
            use_running_average=deterministic,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )
        first_out = bn(first)
        axes = tuple(range(first.ndim - 1))
        if deterministic:
            ra = self.get_variable("batch_stats", "bn")
            mean, var = ra["mean"], ra["var"]
        else:
            mean = jnp.mean(first, axis=axes)
            var = jnp.mean(jnp.square(first), axis=axes) - jnp.square(mean)
        scale = self.get_variable("params", "bn")["scale"]
        bias = self.get_variable("params", "bn")["bias"]
        std = jnp.sqrt(var + self.epsilon)
        second_out = scale * (second - mean) / std + bias
        return jnp.concatenate([first_out, second_out.astype(first_out.dtype)], axis=0)


def partial_relu(x: jax.Array) -> jax.Array:
    """ReLU whose activation mask comes from the first half of the batch and
    is reused (stop-gradiented) for the second half (ref nowak.py:36-48)."""
    n = x.shape[0] // 2
    mask = jax.lax.stop_gradient(x[:n] > 0.0)
    mask = jnp.concatenate([mask, mask], axis=0).astype(x.dtype)
    return x * mask


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm replacement backed by the one-pass Pallas kernel
    (ops/pallas/fused_ln.py) — same param names/shapes ("scale", "bias"), so
    checkpoints are interchangeable. The VERDICT-r2 #9 experiment module:
    models enable it via the NRV_FUSED_LN env gate (models/layers.py), and
    it falls back to flax LayerNorm math off-TPU-unsupported feature dims."""

    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .pallas.fused_ln import fused_layer_norm, fused_ln_supported

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (d,),
                          self.param_dtype)
        dtype = self.dtype or x.dtype
        if not fused_ln_supported(d):
            mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
            xc = x.astype(jnp.float32) - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            y = xc * jax.lax.rsqrt(var + self.epsilon)
            y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            return y.astype(dtype)
        interpret = jax.default_backend() != "tpu"
        return fused_layer_norm(
            x.astype(dtype), scale, bias, self.epsilon, interpret
        )
