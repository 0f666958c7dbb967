"""Positional embeddings: fixed sincos (1D/2D/3D) and learned-posemb resizing.

Formulas follow the reference exactly:
  - 2D: ref simple_vit.py:15-28 (``posemb_sincos_2d``) — per-axis frequency
    bank of ``dim // 4`` omegas, concatenation order (sin x, cos x, sin y, cos y).
  - 1D: ref simple_vit_1d.py:9-20 — ``dim // 2`` omegas, (sin, cos).
  - 3D: ref simple_vit_3d.py:13-30 — ``dim // 6`` omegas, (sin/cos per axis),
    zero-padded to ``dim``.
  - learned-posemb bicubic interpolation for resolution transfer:
    ref vit.py:522-603 (``interpolate_embeddings``).

These are pure functions of static shapes; under ``jit`` they constant-fold,
so unlike the reference (which recomputes per forward, simple_vit.py:142)
there is zero runtime cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "posemb_sincos_1d",
    "posemb_sincos_2d",
    "posemb_sincos_3d",
    "resize_posemb_grid",
]


@functools.lru_cache(maxsize=64)
def _cached_2d(h: int, w: int, dim: int, temperature: float) -> jax.Array:
    if dim % 4 != 0:
        raise ValueError("feature dimension must be multiple of 4 for sincos emb")
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    omega = jnp.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature**omega)
    y = y.reshape(-1)[:, None] * omega[None, :]
    x = x.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate(
        (jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)), axis=1
    ).astype(jnp.float32)


def posemb_sincos_2d(
    h: int, w: int, dim: int, temperature: float = 10000.0, dtype=jnp.float32
) -> jax.Array:
    """[h*w, dim] 2D sincos table (ref simple_vit.py:15-28)."""
    return _cached_2d(int(h), int(w), int(dim), float(temperature)).astype(dtype)


def posemb_sincos_1d(
    n: int, dim: int, temperature: float = 10000.0, dtype=jnp.float32
) -> jax.Array:
    """[n, dim] 1D sincos table (ref simple_vit_1d.py:9-20)."""
    if dim % 2 != 0:
        raise ValueError("feature dimension must be multiple of 2 for sincos emb")
    pos = jnp.arange(n)
    omega = jnp.arange(dim // 2) / (dim // 2 - 1)
    omega = 1.0 / (temperature**omega)
    angles = pos[:, None] * omega[None, :]
    return jnp.concatenate((jnp.sin(angles), jnp.cos(angles)), axis=1).astype(dtype)


def posemb_sincos_3d(
    f: int, h: int, w: int, dim: int, temperature: float = 10000.0, dtype=jnp.float32
) -> jax.Array:
    """[f*h*w, dim] 3D (frames, height, width) sincos table
    (ref simple_vit_3d.py:13-30); zero-pads the remainder when 6 ∤ dim."""
    z, y, x = jnp.meshgrid(jnp.arange(f), jnp.arange(h), jnp.arange(w), indexing="ij")
    fourier_dim = dim // 6
    omega = jnp.arange(fourier_dim) / max(fourier_dim - 1, 1)
    omega = 1.0 / (temperature**omega)
    z = z.reshape(-1)[:, None] * omega[None, :]
    y = y.reshape(-1)[:, None] * omega[None, :]
    x = x.reshape(-1)[:, None] * omega[None, :]
    pe = jnp.concatenate(
        (jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y), jnp.sin(z), jnp.cos(z)),
        axis=1,
    )
    pad = dim - pe.shape[1]
    if pad:
        pe = jnp.pad(pe, ((0, 0), (0, pad)))
    return pe.astype(dtype)


def resize_posemb_grid(
    posemb: jax.Array,
    new_hw: tuple[int, int],
    old_hw: tuple[int, int] | None = None,
    num_prefix_tokens: int = 1,
    method: str = "bicubic",
) -> jax.Array:
    """Resize a learned positional-embedding table to a new token grid.

    TPU-native equivalent of ``interpolate_embeddings`` (ref vit.py:522-603):
    splits off class/prefix tokens, reshapes the grid part to 2D, resizes with
    ``jax.image.resize`` (bicubic by default, matching the reference), and
    re-concatenates.

    Args:
      posemb: ``[num_prefix + old_h*old_w, dim]`` or with a leading batch dim 1.
      new_hw: target (h, w) token-grid shape.
      old_hw: source grid; inferred as a square grid if omitted.
      num_prefix_tokens: class/dist tokens to carry through untouched.
    """
    squeeze = posemb.ndim == 3
    if squeeze:
        posemb = posemb[0]
    prefix, grid = posemb[:num_prefix_tokens], posemb[num_prefix_tokens:]
    if old_hw is None:
        side = int(round(grid.shape[0] ** 0.5))
        if side * side != grid.shape[0]:
            raise ValueError(f"cannot infer square grid from {grid.shape[0]} tokens")
        old_hw = (side, side)
    dim = grid.shape[-1]
    grid = grid.reshape(old_hw[0], old_hw[1], dim)
    grid = jax.image.resize(grid, (new_hw[0], new_hw[1], dim), method=method)
    out = jnp.concatenate([prefix, grid.reshape(-1, dim)], axis=0)
    return out[None] if squeeze else out
