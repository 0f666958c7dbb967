"""Small shared helpers (ref vit_pytorch_robust/utils.py:1115-1205)."""

from __future__ import annotations

import collections.abc
import functools
import itertools

import jax
import jax.numpy as jnp

from .compile_cache import enable_compilation_cache

__all__ = [
    "enable_compilation_cache",
    "pair",
    "to_1tuple",
    "to_2tuple",
    "to_3tuple",
    "to_4tuple",
    "to_ntuple",
    "get_act_fn",
    "trunc_normal_init",
]


def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(itertools.repeat(x, n))

    return parse


to_1tuple = _ntuple(1)
to_2tuple = _ntuple(2)
to_3tuple = _ntuple(3)
to_4tuple = _ntuple(4)


def to_ntuple(n):
    return _ntuple(n)


def pair(t):
    """(ref simple_vit.py:11-12)"""
    return t if isinstance(t, tuple) else (t, t)


_ACTS = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "gelu": functools.partial(jax.nn.gelu, approximate=False),
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "hardswish": jax.nn.hard_swish,
    "hard_swish": jax.nn.hard_swish,
    "hardsigmoid": jax.nn.hard_sigmoid,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
    "": lambda x: x,
}


def get_act_fn(name):
    """Name → activation function (ref utils.py:1115-1145 ``get_act_layer``).
    Callables pass through."""
    if callable(name):
        return name
    try:
        return _ACTS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown activation: {name!r}") from None


def trunc_normal_init(std: float = 0.02, mean: float = 0.0, a: float = -2.0, b: float = 2.0):
    """Flax initializer matching timm's ``trunc_normal_`` (ref utils.py:1040-
    1075): normal(mean, std) truncated to the *absolute* interval [a, b]
    (torch semantics; jax's ``truncated_normal`` truncates in units of std)."""

    def init(key, shape, dtype=jnp.float32):
        lo = (a - mean) / std
        hi = (b - mean) / std
        x = jax.random.truncated_normal(key, lo, hi, shape, jnp.float32)
        return (x * std + mean).astype(dtype)

    return init
